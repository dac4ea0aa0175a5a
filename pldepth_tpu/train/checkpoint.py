"""Checkpoint / resume via Orbax.

The reference checkpointed weights-only .h5 through Keras ModelCheckpoint
(pldepth/util/tracking_utils.py:21-30) and ad-hoc ``model.save_weights``
(PLDepth.py:180-181), losing optimizer state on resume (SURVEY.md §5). Here
the full TrainState — params, BN statistics, optimizer state, step counter —
round-trips, so a resumed run continues bit-compatibly; ``best`` tracking
mirrors ModelCheckpoint(save_best_only, monitor=val_loss).
"""

from __future__ import annotations

import json
import logging
import os
from typing import Optional

import jax
import orbax.checkpoint as ocp

log = logging.getLogger(__name__)


class CheckpointManager:
    def __init__(self, directory: str, keep: int = 3, async_save: bool = True):
        """``async_save`` (default): saves are staged and written by Orbax's
        background thread, so the train loop resumes immediately — the
        epoch-end checkpoint overlaps the next epoch's compute instead of
        stalling the chips on host I/O. Safe because the train step is
        functional (each step builds a NEW state pytree; the staged one is
        never mutated). Callers that exit right after a save (preemption)
        pass ``wait=True``; ``close()`` always drains."""
        self.directory = os.path.abspath(directory)
        os.makedirs(self.directory, exist_ok=True)
        self._async = async_save
        self._mgr = ocp.CheckpointManager(
            self.directory,
            options=ocp.CheckpointManagerOptions(
                max_to_keep=keep, create=True,
                enable_async_checkpointing=async_save,
            ),
        )
        self._best_path = os.path.join(self.directory, "best_val.json")
        self.best_val = float("inf")
        if os.path.exists(self._best_path):
            # persists across --resume: without this, the first post-resume
            # validation always looked like a new "best" and could rotate
            # the true-best checkpoint out of max_to_keep
            try:
                with open(self._best_path) as f:
                    self.best_val = float(json.load(f)["best_val"])
            except Exception:  # corrupt marker: fall back to fresh tracking
                log.warning("unreadable %s; best-val tracking resets",
                            self._best_path)

    def save(self, step: int, state, metrics: Optional[dict] = None,
             force=False, wait: bool = False):
        state = state if self._async else jax.device_get(state)
        self._mgr.save(
            step,
            args=ocp.args.StandardSave(state),
            metrics=metrics,
            force=force,
        )
        if wait or not self._async:
            self._mgr.wait_until_finished()

    def maybe_save_best(self, step: int, state, val_loss: float):
        """save_best_only semantics on val_loss (tracking_utils.py:27-30)."""
        if val_loss < self.best_val:
            self.best_val = val_loss
            with open(self._best_path, "w") as f:
                json.dump({"best_val": float(val_loss), "step": int(step)}, f)
            self.save(step, state, metrics={"val_loss": val_loss}, force=True)
            return True
        return False

    def latest_step(self) -> Optional[int]:
        return self._mgr.latest_step()

    def wait(self):
        """Block until all in-flight async saves are durably on disk."""
        self._mgr.wait_until_finished()

    def restore(self, state_template, step: Optional[int] = None):
        self._mgr.wait_until_finished()  # a just-saved step must be visible
        step = step if step is not None else self._mgr.latest_step()
        if step is None:
            raise FileNotFoundError(f"no checkpoints under {self.directory}")
        # abstract template: restoring against shape/dtype structs avoids a
        # full device->host gather of the freshly-initialized state
        abstract = jax.tree_util.tree_map(
            lambda a: jax.ShapeDtypeStruct(a.shape, a.dtype), state_template
        )
        restored = self._mgr.restore(
            step, args=ocp.args.StandardRestore(abstract)
        )
        return restored

    def close(self):
        self._mgr.close()  # drains pending async saves


def save_weights_npz(path: str, state) -> None:
    """Portable weights-only export (params + batch_stats), the analogue of
    the reference's model.save_weights h5 (PLDepth.py:180)."""
    from pldepth_tpu.models.pretrained import save_backbone

    save_backbone(path, jax.device_get(state.params), jax.device_get(state.batch_stats))


def load_weights_npz(path: str, state):
    """Warm-start from a weights-only export (reference --load_model_path)."""
    from pldepth_tpu.models.pretrained import load_backbone

    params, batch_stats = load_backbone(path, state.params, state.batch_stats)
    return state.replace(params=params, batch_stats=batch_stats)


def infer_decoder_head_ch(path: str, default: int = 32) -> int:
    """Read the trained decoder width straight from a weights npz.

    Models trained with ``--decoder_head_ch != 32`` are otherwise
    unloadable by the serving/eval CLI commands (they build the model
    before loading, and conv4's out-channels must match). The ff_redweb
    family has no ``decoder/conv4``; the default is returned and ignored.
    """
    import numpy as np

    try:
        with np.load(path) as archive:
            key = "params/decoder/conv4/kernel"
            if key in archive:
                return int(archive[key].shape[-1])
    except Exception:
        pass
    return default
