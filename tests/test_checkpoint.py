"""Checkpoint/resume: full-state Orbax round trip + weights-only export."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
from pldepth_tpu.train import Trainer
from pldepth_tpu.train.checkpoint import (
    CheckpointManager,
    load_weights_npz,
    save_weights_npz,
)

S = 64


@pytest.fixture(scope="module")
def trained():
    # ff_smoke: checkpoint save/restore mechanics are model-independent
    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=S, batch_size=8, ranking_size=3,
        rankings_per_image=8, sampling_type=1, freeze_encoder=False,
        compute_dtype="float32", listmle_impl="xla", initial_lr=3e-4,
    )
    # 1-device mesh: checkpoint semantics are mesh-independent and a full
    # train-step compile on the 8-way virtual mesh costs minutes here
    from pldepth_tpu.core.mesh import make_mesh

    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=8, image_size=S, seed=0)
    it = BatchIterator(ds, cfg.batch_size, seed=0)
    for _ in range(2):
        state, _ = trainer.train_step(state, trainer.shard_batch(next(it)))
    it.close()
    return trainer, state


def test_orbax_full_state_roundtrip(trained, tmp_path):
    trainer, state = trained
    mgr = CheckpointManager(str(tmp_path / "ckpt"), keep=2)
    mgr.save(int(jax.device_get(state.step)), state)
    template = trainer.init_state()
    restored = mgr.restore(template)
    mgr.close()
    # step, params and optimizer state all round-trip
    assert int(restored.step) == int(jax.device_get(state.step))
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    n_opt_a = jax.tree_util.tree_leaves(jax.device_get(state.opt_state))
    n_opt_b = jax.tree_util.tree_leaves(restored.opt_state)
    assert len(n_opt_a) == len(n_opt_b)
    changed = [
        not np.array_equal(np.asarray(x), np.asarray(y))
        for x, y in zip(
            jax.tree_util.tree_leaves(jax.device_get(template.params)),
            jax.tree_util.tree_leaves(restored.params),
        )
    ]
    assert any(changed), "restored params identical to a fresh init"


def test_best_only_semantics(trained, tmp_path):
    trainer, state = trained
    mgr = CheckpointManager(str(tmp_path / "best"), keep=2)
    assert mgr.maybe_save_best(0, state, 1.0)
    assert not mgr.maybe_save_best(1, state, 1.5)  # worse -> no save
    assert mgr.maybe_save_best(2, state, 0.5)
    assert mgr.latest_step() == 2
    mgr.close()


def test_weights_npz_roundtrip(trained, tmp_path):
    trainer, state = trained
    path = str(tmp_path / "w.npz")
    save_weights_npz(path, state)
    fresh = trainer.init_state()
    warm = load_weights_npz(path, fresh)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(state.params["decoder"]["head"]["kernel"])),
        np.asarray(jax.device_get(warm.params["decoder"]["head"]["kernel"])),
    )


def test_async_save_drains_on_close(trained, tmp_path):
    """Async mode (the default): restore() sees a just-enqueued save, and
    close() drains in-flight writes so a reopened manager sees them."""
    trainer, state = trained
    mgr = CheckpointManager(str(tmp_path / "async"), keep=2, async_save=True)
    mgr.save(1, state)
    restored = mgr.restore(trainer.init_state())  # waits internally
    for a, b in zip(
        jax.tree_util.tree_leaves(jax.device_get(state.params)),
        jax.tree_util.tree_leaves(restored.params),
    ):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # enqueue another save and close immediately: close() must drain it
    mgr.save(2, state, force=True)
    mgr.close()
    mgr2 = CheckpointManager(str(tmp_path / "async"), keep=2)
    assert mgr2.latest_step() == 2
    mgr2.close()


def test_best_val_persists_across_managers(tmp_path, trained):
    """save_best_only across --resume: a new manager over the same dir must
    remember the prior best so a worse post-resume val_loss is NOT saved
    as 'best'."""
    from pldepth_tpu.train.checkpoint import CheckpointManager

    _trainer, state = trained
    d = str(tmp_path / "ck")
    m1 = CheckpointManager(d, async_save=False)
    assert m1.maybe_save_best(1, state, 0.30)
    m1.close()

    m2 = CheckpointManager(d, async_save=False)
    assert m2.best_val == 0.30
    assert not m2.maybe_save_best(2, state, 0.45)  # worse: rejected
    assert m2.maybe_save_best(3, state, 0.25)  # better: accepted
    m2.close()
