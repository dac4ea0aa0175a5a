"""On-device batched eval metrics: ordinal error / WHDR(tau) / NDCG@k.

The reference computes eval metrics per image in host numpy after a
per-image ``model.predict`` (pldepth/active_learning/metrics.py:60-120);
eval/metrics.py keeps those host implementations reference-exact (same
seeds) for score parity. This module is the TPU-native fast path: the same
metric *formulas*, vmapped over the batch and jitted, consuming predictions
that never leave the device — the host receives one scalar per (image,
metric) instead of the full-resolution maps.

Pair/pixel sampling uses ``jax.random`` (a different RNG stream than the
reference's ``np.random.RandomState(10)``), so values agree with the host
path statistically, not bitwise: for 5000 pairs the sampling noise on an
error rate p is ~sqrt(p(1-p)/5000) (<0.008). The pair-scoring arithmetic is
exact — tests inject identical indices into both paths and assert equality.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import jax
import jax.numpy as jnp


def pairwise_disagreement(
    pred_flat: jax.Array,
    gt_flat: jax.Array,
    i0: jax.Array,
    i1: jax.Array,
    tau: float = 0.0,
    invert_pred_order: bool = False,
) -> jax.Array:
    """Fraction of index pairs whose predicted relation disagrees with gt.

    tau=0: strict order comparison (reference ordinal_error,
    metrics.py:60-70). tau>0: the ratio relation of depth_utils.py:5-21
    (ratio >= 1+tau -> 1, <= 1/(1+tau) -> -1, else 0) on both maps — the
    WHDR(tau) variant. Scalar output; one image.
    """
    p0, p1 = pred_flat[i0], pred_flat[i1]
    g0, g1 = gt_flat[i0], gt_flat[i1]
    if tau == 0.0:
        pred_order = p0 > p1
        if invert_pred_order:
            pred_order = ~pred_order
        return 1.0 - jnp.mean((pred_order == (g0 > g1)).astype(jnp.float32))
    eps = 1e-10

    def rel(a, b):
        ratio = (a.astype(jnp.float64 if jax.config.jax_enable_x64 else jnp.float32) + eps) / (b + eps)
        return jnp.where(ratio >= 1 + tau, 1, jnp.where(ratio <= 1 / (1 + tau), -1, 0))

    r_gt = rel(g0, g1)
    r_pred = rel(p0, p1)
    if invert_pred_order:
        r_pred = -r_pred
    return jnp.mean((r_gt != r_pred).astype(jnp.float32))


def _draw_pairs(key: jax.Array, n: int, num_pairs: int) -> Tuple[jax.Array, jax.Array]:
    """2*num_pairs distinct flat indices (matches the reference's
    replace=False draw, metrics.py:62)."""
    idx = jax.random.choice(key, n, (2 * num_pairs,), replace=False)
    return idx[:num_pairs], idx[num_pairs:]


def _minmax01(x: jax.Array) -> jax.Array:
    lo, hi = x.min(), x.max()
    return jnp.where(hi - lo < 1e-12, jnp.zeros_like(x), (x - lo) / (hi - lo))


def _dcg(rel: jax.Array) -> jax.Array:
    return (rel / jnp.log2(jnp.arange(rel.shape[0]) + 2.0)).sum()


def ndcg_sampled(
    pred_flat: jax.Array, gt_flat: jax.Array, ids: jax.Array
) -> jax.Array:
    """NDCG@|ids| with relevance 1/(depth+1), pred minmax-normalized.

    Same formula as the host ndcg_at_k (reference calc_d,
    metrics.py:92-109), including the faithful quirk that both lists are
    sorted by their own values.
    """
    sorted_pred = jnp.sort(_minmax01(pred_flat)[ids])
    sorted_gt = jnp.sort(gt_flat[ids])
    return _dcg(1.0 / (sorted_pred + 1.0)) / _dcg(1.0 / (sorted_gt + 1.0))


@partial(
    jax.jit,
    static_argnames=("num_pairs", "tau", "invert_pred_order", "ndcg_list_size"),
)
def eval_metrics_batch(
    key: jax.Array,
    preds: jax.Array,
    gts: jax.Array,
    num_pairs: int = 5000,
    tau: float = 0.03,
    invert_pred_order: bool = False,
    ndcg_list_size: int = 200,
) -> dict:
    """Per-image device metrics for a batch of maps.

    Args:
      key: PRNG key (pair/pixel sampling; fold per-batch for determinism).
      preds: (B, H, W) predicted depth maps (device-resident).
      gts: (B, H, W) ground-truth maps.

    Returns:
      dict of (B,) float32 arrays: ordinal_error, whdr (at ``tau``), ndcg.
    """
    b = preds.shape[0]
    n = preds.shape[1] * preds.shape[2]
    num_pairs = min(num_pairs, n // 2)
    ndcg_list_size = min(ndcg_list_size, n)
    pf = preds.reshape(b, n)
    gf = gts.reshape(b, n)

    def one(k, p, g):
        k_pairs, k_ids = jax.random.split(k)
        i0, i1 = _draw_pairs(k_pairs, n, num_pairs)
        ids = jax.random.choice(k_ids, n, (ndcg_list_size,), replace=False)
        return (
            pairwise_disagreement(p, g, i0, i1, 0.0, invert_pred_order),
            pairwise_disagreement(p, g, i0, i1, tau, invert_pred_order),
            ndcg_sampled(p, g, ids),
        )

    oe, wh, nd = jax.vmap(one)(jax.random.split(key, b), pf, gf)
    return {"ordinal_error": oe, "whdr": wh, "ndcg": nd}
