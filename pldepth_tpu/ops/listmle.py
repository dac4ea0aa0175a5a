"""Plackett-Luce ListMLE negative log-likelihood.

TPU-native replacement for the reference loss stack
(pldepth/losses/nll_loss.py:10-62 wrapping ``tensorflow_ranking``'s
ListMLELoss, with the label->logit join in
pldepth/data/depth_utils.py:39-61).

Semantics. Given per-list scores ``s`` and ground-truth labels, positions are
ordered by label descending (the permutation ``pi``); the loss of one list is
the Plackett-Luce negative log-likelihood

    nll = sum_i [ log( sum_{j >= i} exp(s_pi(j)) ) - s_pi(i) ]

The samplers already emit lists sorted by ground-truth depth descending
(pldepth/data/sampling.py:121-122), but like ``tensorflow_ranking`` we re-sort
by label inside the loss so unsorted callers get correct results (ties break
by position — deterministic, unlike tfr's random shuffle; tests use distinct
labels so both agree).

Two implementations:

* ``xla``   — pure jnp (``jax.lax.cumlogsumexp``), autodiff backward. Serves
              as the golden reference and the fallback on CPU.
* ``pallas``— a fused TPU kernel over a (K, N)-transposed layout (lists
              across lanes, list positions across sublanes) computing the
              reversed log-cumsum-exp and per-list NLL in one VMEM pass, with
              a hand-written, numerically-stable backward kernel (custom VJP).

Both keep everything in float32: K is small (3..500) so the loss is a
negligible fraction of step FLOPs; what matters is that it fuses and never
falls back to host like the reference's ``tf.numpy_function`` pipeline did.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from pldepth_tpu.ops import listmle_pallas


def _sort_by_labels_desc(scores: jax.Array, labels: jax.Array) -> jax.Array:
    order = jnp.argsort(-labels, axis=-1, stable=True)
    return jnp.take_along_axis(scores, order, axis=-1)


def _listmle_sorted_xla(s: jax.Array) -> jax.Array:
    """NLL for lists already sorted by label descending. s: (N, K) -> (N,)."""
    s = s.astype(jnp.float32)
    axis = s.ndim - 1  # cumlogsumexp rejects negative axes
    lse = jax.lax.cumlogsumexp(s, axis=axis, reverse=True)
    return jnp.sum(lse - s, axis=-1)


def _resolve_impl(impl: str) -> str:
    if impl == "auto":
        from pldepth_tpu.ops.listmle_pallas import on_tpu

        return "pallas" if on_tpu() else "xla"
    if impl not in ("xla", "pallas"):
        raise ValueError(f"unknown listmle impl: {impl!r}")
    return impl


def listmle_nll(
    scores: jax.Array,
    labels: jax.Array,
    impl: str = "auto",
) -> jax.Array:
    """Per-list Plackett-Luce NLL.

    Args:
      scores: (N, K) predicted utilities (model depths at ranked pixels).
      labels: (N, K) ground-truth depths defining the target order
        (descending = closer first, HR-WSI convention,
        reference pldepth/models/pl_hourglass.py:22-31).
      impl: "auto" | "xla" | "pallas".

    Returns:
      (N,) float32 per-list negative log-likelihood.
    """
    if scores.shape != labels.shape:
        raise ValueError(f"shape mismatch {scores.shape} vs {labels.shape}")
    s = _sort_by_labels_desc(scores.astype(jnp.float32), labels)
    if _resolve_impl(impl) == "pallas":
        return listmle_pallas.listmle_sorted(s)
    return _listmle_sorted_xla(s)


def gather_ranked_scores(pred_maps: jax.Array, point_idx: jax.Array) -> jax.Array:
    """Gather predicted depths at flat ranked-pixel indices.

    Replaces the reference's label->logit join
    (pldepth/data/depth_utils.py:39-61): depth maps are flattened per image
    and indexed with ``flat = x * W + y`` coordinates; the backward pass is
    the corresponding scatter-add, which XLA emits natively on TPU.

    Args:
      pred_maps: (B, H, W) or (B, H, W, 1) predicted depth maps.
      point_idx: (B, RPI, K) int32 flat pixel indices.

    Returns:
      (B * RPI, K) gathered scores.
    """
    b = pred_maps.shape[0]
    flat = pred_maps.reshape(b, -1)
    k = point_idx.shape[-1]
    sel = jnp.take_along_axis(flat, point_idx.reshape(b, -1).astype(jnp.int32), axis=1)
    return sel.reshape(-1, k)


def pl_ranking_loss(
    pred_maps: jax.Array,
    rankings: jax.Array,
    impl: str = "auto",
) -> jax.Array:
    """Mean ListMLE loss of predicted depth maps against sampled rankings.

    Equivalent to HourglassNegativeLogLikelihood / the per-batch loss of the
    reference (pldepth/losses/nll_loss.py:51-62 with Keras Reduction.AUTO =
    mean over the B*RPI lists).

    Args:
      pred_maps: (B, H, W[, 1]) predicted depth maps.
      rankings: (B, RPI, K, 2) float32; [..., 0] flat pixel index,
        [..., 1] ground-truth depth (lists sorted descending by depth).
    """
    point_idx = rankings[..., 0].astype(jnp.int32)
    gt_depths = rankings[..., 1].reshape(-1, rankings.shape[-2])
    scores = gather_ranked_scores(pred_maps, point_idx)
    nll = listmle_nll(scores, gt_depths, impl=impl)
    return jnp.mean(nll)


def pl_ranking_loss_from_scores(
    scores: jax.Array,
    rankings: jax.Array,
    impl: str = "auto",
) -> jax.Array:
    """Mean ListMLE loss from pre-gathered scores (sparse decoder tail).

    The sparse-tail model path (ops/sparse_tail.py) returns predicted depths
    at the ranked pixels directly, in the flattened order of
    ``rankings[..., 0]`` — no map gather needed.

    Args:
      scores: (B, RPI * K) predicted depths at the ranked pixels.
      rankings: (B, RPI, K, 2) as in :func:`pl_ranking_loss`.
    """
    k = rankings.shape[-2]
    gt_depths = rankings[..., 1].reshape(-1, k)
    nll = listmle_nll(scores.reshape(-1, k), gt_depths, impl=impl)
    return jnp.mean(nll)
