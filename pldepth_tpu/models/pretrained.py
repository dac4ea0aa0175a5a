"""Offline pretrained-backbone import.

The reference gets ImageNet weights implicitly from
``keras.applications.EfficientNetB0/ResNet50`` downloads
(pldepth/models/pl_hourglass.py:48, redweb.py:410). This environment has no
network egress, so pretrained weights must be supplied as a local ``.npz``
produced offline by :func:`convert_keras_h5` / :func:`convert_torch_state`
(key layout documented there). When no file is given, training falls back to
random init — in that case ``freeze_encoder`` should be disabled
(a frozen random encoder cannot learn; the Trainer warns).
"""

from __future__ import annotations

import logging
from typing import Any, Dict, Tuple

import jax
import numpy as np

log = logging.getLogger(__name__)


def load_backbone(path: str, params, batch_stats) -> Tuple[Any, Any]:
    """Overlay a converted-weights .npz onto freshly-initialized variables.

    The archive maps flattened pytree paths ("params/encoder/stem_conv/kernel"
    and "batch_stats/encoder/stem_bn/mean") to arrays. Missing keys keep
    their random init; shape mismatches raise.
    """
    archive = np.load(path)
    tree = {"params": params, "batch_stats": batch_stats}
    flat = dict(jax.tree_util.tree_flatten_with_path(tree)[0])

    def key_str(path_tuple):
        return "/".join(str(getattr(p, "key", p)) for p in path_tuple)

    by_name = {key_str(k): k for k in flat}
    loaded, skipped = 0, 0
    updates = {}
    for name in archive.files:
        if name not in by_name:
            skipped += 1
            continue
        k = by_name[name]
        cur = flat[k]
        arr = archive[name]
        if cur.shape != arr.shape:
            raise ValueError(
                f"pretrained weight {name}: shape {arr.shape} != model {cur.shape}"
            )
        updates[k] = arr.astype(np.asarray(cur).dtype)
        loaded += 1

    def maybe_replace(path_tuple, leaf):
        return updates.get(path_tuple, leaf)

    new_tree = jax.tree_util.tree_map_with_path(maybe_replace, tree)
    log.info("pretrained import: %d tensors loaded, %d unmatched", loaded, skipped)
    if loaded == 0:
        raise ValueError(f"no tensors in {path} matched the model tree")
    return new_tree["params"], new_tree["batch_stats"]


def overlay_synthetic(params, batch_stats, names) -> Tuple[Any, Any]:
    """Overlay deterministic ``models/convert.synth_weight`` values onto the
    tree for every pytree path in ``names``.

    The cross-framework goldens (tools/full_parity_check.py) assign these
    same values into the reference Keras model; regenerating them here from
    the names alone lets tests/test_full_parity.py run TF-free without a
    checked-in weight archive. Unknown names raise (catches tree drift).
    """
    from pldepth_tpu.models.convert import synth_weight

    tree = {"params": params, "batch_stats": batch_stats}
    flat = dict(jax.tree_util.tree_flatten_with_path(tree)[0])
    by_name = {
        "/".join(str(getattr(p, "key", p)) for p in k): k for k in flat
    }
    unknown = [n for n in names if str(n) not in by_name]
    if unknown:
        raise ValueError(f"synthetic overlay: {len(unknown)} unknown paths, "
                         f"e.g. {unknown[:5]}")
    updates = {
        by_name[str(n)]: synth_weight(
            str(n), np.asarray(flat[by_name[str(n)]]).shape
        ).astype(np.asarray(flat[by_name[str(n)]]).dtype)
        for n in names
    }
    new_tree = jax.tree_util.tree_map_with_path(
        lambda k, leaf: updates.get(k, leaf), tree
    )
    return new_tree["params"], new_tree["batch_stats"]


def save_backbone(path: str, params, batch_stats, prefixes=None) -> int:
    """Inverse of :func:`load_backbone` (used to snapshot converted weights).

    ``prefixes`` (optional tuple of flattened-name prefixes, e.g.
    ``("params/encoder/", "batch_stats/encoder/")``) restricts the archive to
    a subtree — drive_qenc's self-pretrain stage exports the encoder alone so
    gate training starts the decoder from scratch. Returns the tensor count.
    """
    tree = {"params": params, "batch_stats": batch_stats}
    flat = jax.tree_util.tree_flatten_with_path(tree)[0]
    out: Dict[str, np.ndarray] = {}
    for path_tuple, leaf in flat:
        name = "/".join(str(getattr(p, "key", p)) for p in path_tuple)
        if prefixes is None or name.startswith(tuple(prefixes)):
            out[name] = np.asarray(leaf)
    if not out:
        raise ValueError(f"save_backbone: no tensors matched prefixes {prefixes}")
    np.savez(path, **out)
    return len(out)
