"""Fused Pallas TPU kernel for the sorted ListMLE NLL (forward + backward).

Layout choice: the (N, K) list matrix is transposed to (K, N) so that

* the N independent lists run across the 128-wide *lane* axis (perfectly
  parallel on the VPU), and
* the K list positions run down the *sublane* axis, where the reversed
  cumulative sums the loss needs are cheap vector ops.

Forward (per lane / list), with m = max_k s_k:

    e_k   = exp(s_k - m)
    rev_k = sum_{j >= k} e_j            (reverse cumsum: total - cumsum + e)
    lse_k = log(rev_k) + m              = log sum_{j>=k} exp(s_j)
    nll   = sum_k (lse_k - s_k)

Backward (stable closed form; lse is non-increasing so lse_{K-1} = min):

    dL/ds_j = sum_{i <= j} exp(s_j - lse_i) - 1
            = exp(s_j - lse_{K-1} + log C_j) - 1,
      C_j   = cumsum_{i <= j} exp(lse_{K-1} - lse_i)   (all terms <= 1)

Every exponent above is bounded by log(K)+O(1) because the true gradient lies
in [-1, K], so the whole pass stays in float32 with no overflow. K is padded
to the 8-sublane float32 tile and masked with a -1e30 sentinel; N is padded
to the lane width.

This replaces the ``tensorflow_ranking`` ListMLE graph of the reference
(pldepth/losses/nll_loss.py:36, sort + logcumsumexp built from many TF ops)
with one VMEM-resident kernel per 128 lists.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_LANES = 128
_SUBLANES = 8
_NEG = -1e30
_TINY = 1e-37


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


def on_tpu() -> bool:
    """True when the default backend is TPU hardware. Checks the device,
    not just the platform string: experimental PJRT plugins can register
    under another name (this machine's tunnel plugin registers as 'axon')
    while still exposing TPU devices."""
    if jax.default_backend() == "tpu":
        return True
    try:
        d = jax.devices()[0]
    except Exception:
        return False
    return d.platform == "tpu" or "TPU" in (getattr(d, "device_kind", "") or "")


def _interpret() -> bool:
    # Off-TPU (CPU test meshes) the kernel runs in interpreter mode so the
    # same code path is exercised everywhere.
    return not on_tpu()


def _suffix_sum_matrix(k_pad: int):
    """M[k, j] = 1 iff j >= k, so (M @ e)[k] = sum_{j>=k} e_j.

    Cumulative sums along sublanes are expressed as a tiny triangular matmul:
    Mosaic has no cumsum lowering, and on TPU an (8..128)^2 MXU matmul is
    effectively free next to the exp/log traffic.
    """
    row = jax.lax.broadcasted_iota(jnp.int32, (k_pad, k_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k_pad, k_pad), 1)
    return (col >= row).astype(jnp.float32)


def _prefix_sum_matrix(k_pad: int):
    """M[k, j] = 1 iff j <= k, so (M @ w)[k] = sum_{i<=k} w_i."""
    row = jax.lax.broadcasted_iota(jnp.int32, (k_pad, k_pad), 0)
    col = jax.lax.broadcasted_iota(jnp.int32, (k_pad, k_pad), 1)
    return (col <= row).astype(jnp.float32)


def _fwd_kernel(k_actual: int, s_ref, nll_ref, lse_ref):
    s = s_ref[:]  # (K_pad, LANES) float32, padded rows already -1e30
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    valid = kidx < k_actual

    m = jnp.max(s, axis=0, keepdims=True)  # padded rows can't win: -1e30
    e = jnp.exp(s - m)  # padded rows -> exp(-huge) == 0
    rev = jnp.dot(  # sum_{j>=k} e_j via suffix-sum matmul (MXU)
        _suffix_sum_matrix(s.shape[0]), e, preferred_element_type=jnp.float32
    )
    lse = jnp.log(jnp.maximum(rev, _TINY)) + m
    lse_ref[:] = lse
    nll_ref[:] = jnp.sum(jnp.where(valid, lse - s, 0.0), axis=0, keepdims=True)


def _bwd_kernel(k_actual: int, s_ref, lse_ref, g_ref, ds_ref):
    s = s_ref[:]
    lse = lse_ref[:]
    g = g_ref[:]  # (1, LANES) upstream cotangent per list
    kidx = jax.lax.broadcasted_iota(jnp.int32, s.shape, 0)
    valid = kidx < k_actual

    lse_last = lse[k_actual - 1 : k_actual, :]  # smallest lse (non-increasing)
    w = jnp.where(valid, jnp.exp(lse_last - lse), 0.0)  # terms in (0, 1]
    c = jnp.dot(  # prefix sums along list positions, as a matmul
        _prefix_sum_matrix(s.shape[0]), w, preferred_element_type=jnp.float32
    )
    d = jnp.exp(s - lse_last + jnp.log(jnp.maximum(c, _TINY))) - 1.0
    ds_ref[:] = jnp.where(valid, d, 0.0) * g


def _pallas_fwd(s_sorted: jax.Array):
    n, k = s_sorted.shape
    k_pad = _round_up(max(k, 1), _SUBLANES)
    n_pad = _round_up(max(n, 1), _LANES)

    st = jnp.full((k_pad, n_pad), _NEG, dtype=jnp.float32)
    st = st.at[:k, :n].set(s_sorted.T.astype(jnp.float32))

    grid = (n_pad // _LANES,)
    nll_t, lse_t = pl.pallas_call(
        functools.partial(_fwd_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_pad, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=[
            pl.BlockSpec((1, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((1, n_pad), jnp.float32),
            jax.ShapeDtypeStruct((k_pad, n_pad), jnp.float32),
        ],
        interpret=_interpret(),
    )(st)
    return nll_t[0, :n], (st, lse_t)


def _pallas_bwd(k: int, n: int, st: jax.Array, lse_t: jax.Array, g: jax.Array):
    k_pad, n_pad = st.shape
    gt = jnp.zeros((1, n_pad), dtype=jnp.float32)
    gt = gt.at[0, :n].set(g.astype(jnp.float32))

    grid = (n_pad // _LANES,)
    ds_t = pl.pallas_call(
        functools.partial(_bwd_kernel, k),
        grid=grid,
        in_specs=[
            pl.BlockSpec((k_pad, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((k_pad, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (k_pad, _LANES), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((k_pad, n_pad), jnp.float32),
        interpret=_interpret(),
    )(st, lse_t, gt)
    return ds_t[:k, :n].T


@jax.custom_vjp
def listmle_sorted(s_sorted: jax.Array) -> jax.Array:
    """Per-list NLL for label-descending-sorted scores. (N, K) -> (N,)."""
    nll, _ = _pallas_fwd(s_sorted)
    return nll


def _vjp_fwd(s_sorted):
    nll, res = _pallas_fwd(s_sorted)
    return nll, (res, s_sorted.shape)


def _vjp_bwd(residuals, g):
    (st, lse_t), (n, k) = residuals
    return (_pallas_bwd(k, n, st, lse_t, g),)


listmle_sorted.defvjp(_vjp_fwd, _vjp_bwd)
