"""Banded two-pass fused inference MBConv for blocks too large for VMEM.

The whole-image fused kernel (ops/fused_mbconv.py) holds the 6x-expanded
tensor in VMEM, which caps it at mid-resolution blocks; the big early
EfficientNet stages (224^2/112^2 at 448^2 input — the bulk of the
encoder's HBM traffic, docs/BENCH.md) stay on the XLA path, which
round-trips the expanded tensor through HBM ~6 times per block
(expand out, dw in/out, BN/swish, SE scale, project in).

This module fuses those blocks with a row-banded two-pass schedule whose
expanded-tensor HBM traffic is exactly one write + one read:

  pass 1 (kernel): for each horizontal band of output rows — DMA the
      input band (+depthwise halo) from a row-padded HBM copy, expand
      (1x1 matmul) + folded-BN + swish, k x k depthwise via static row
      slices (halo rows are recomputed per band) and zero-fill column
      shifts, BN + swish, stride subsample — write the band of g to HBM
      and accumulate the SE pool in scratch (bands run sequentially per
      image). At the last band, run the tiny SE MLP and emit the
      per-channel scale.
  pass 2 (kernel): per band — read g, apply the SE scale, 1x1 project
      matmul + folded BN, optional residual, write y.

Layouts stay NHWC (C on lanes, W on sublanes) like the whole-image
kernel; row bands only slice the un-tiled major dimension, so every
Mosaic-visible shape matches the patterns the whole-image kernel already
compiles. Numerics mirror ops/fused_mbconv.py (bf16 storage, f32 affine /
accumulation / SE); parity vs mbconv_infer_ref in tests/test_banded_mbconv.py.

Same reference anchor as ops/fused_mbconv.py: the MBConv structure
re-derives keras.applications.EfficientNetB0 used at reference
pldepth/models/pl_hourglass.py:48.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pldepth_tpu.ops.fused_mbconv import (
    MBConvParams,
    _interpret,
    _shift_zero,
)


def _col_taps(h, dw_ref, di: int, p: int, acc_dtype):
    """Sum over column taps for one fixed row offset: h is the row-sliced
    band (rows already offset by di), returns sum_j w[di,dj] * shift_j(h)."""
    g = jnp.zeros(h.shape, acc_dtype)
    for dj in range(-p, p + 1):
        w_tap = dw_ref[di + p, dj + p, :]  # (Ce,)
        sh = _shift_zero(h, dj, 1)
        g = g + sh.astype(acc_dtype) * w_tap[None, None, :].astype(acc_dtype)
    return g


def _expand_dw_kernel(
    # inputs
    x_ref, we_ref, e_s_ref, e_t_ref, dw_ref, d_s_ref, d_t_ref,
    se1w_ref, se1b_ref, se2w_ref, se2b_ref,
    # outputs
    g_ref, scale_ref,
    # scratch
    pool_scr,
    *, k: int, stride: int, has_expand: bool,
    band: int, n_bands: int, in_len: int, hh: int, wi: int, wo: int,
    cin: int,
):
    p = k // 2
    i = pl.program_id(1)

    # band i's input rows in padded coords (see x_bands construction):
    #   stride 1: [i*band, i*band + band + 2p)
    #   stride 2: [2*i*band + 1, 2*i*band + 2*band + 2p)  — out row r
    #     consumes stride-1 rows 2r+1-p..2r+1+p (asymmetric SAME, see
    #     ops/fused_mbconv.py docstring)
    in_off = stride * i * band + (stride - 1)

    x = x_ref[0, 0]  # (in_len, Wi, Cin)
    if has_expand:
        ce = we_ref.shape[-1]
        h = jnp.dot(
            x.reshape(in_len * wi, cin), we_ref[...],
            preferred_element_type=jnp.float32,
        )
        h = h * e_s_ref[0][None, :] + e_t_ref[0][None, :]
        h = (h * jax.nn.sigmoid(h)).astype(x.dtype)
        h = h.reshape(in_len, wi, ce)
        # SAME conv pads the *post-activation* tensor with zeros; the DMA'd
        # halo rows outside the true image would otherwise carry
        # swish(affine(0)) != 0 (expand==1 needs no mask: x's zero pad IS
        # the reference pad)
        v = jax.lax.broadcasted_iota(jnp.int32, h.shape, 0)
        true_row = in_off + v - p
        h = jnp.where((true_row >= 0) & (true_row < hh), h,
                      jnp.zeros_like(h))
    else:
        h = x
        ce = cin

    # depthwise: rows via static slices into the haloed band, cols via
    # zero-fill shifts; g1 rows = stride-1 output rows local to this band
    n1 = in_len - 2 * p  # stride 1: band; stride 2: 2*band - 1 (+1 slack)
    g1 = jnp.zeros((n1, wi, ce), jnp.float32)
    for di in range(0, 2 * p + 1):
        g1 = g1 + _col_taps(h[di : di + n1], dw_ref, di - p, p, jnp.float32)
    g1 = g1 * d_s_ref[0][None, None, :] + d_t_ref[0][None, None, :]
    g1 = g1 * jax.nn.sigmoid(g1)
    g1 = g1.astype(x.dtype)

    if stride == 2:
        # rows: local even indices (global odd); cols: odd indices
        g1 = g1.reshape(n1 // 2, 2, wi, ce)[:, 0]
        g = g1.reshape(-1, wo, 2, ce)[:, :, 1, :]
    else:
        g = g1

    g_ref[0] = g  # (band_out, Wo, Ce)

    # SE pool: sum g over this band's pixels (ones-matmul — Mosaic refuses
    # float ADD multi_reductions over the offset layouts the subsample
    # leaves behind, ops/fused_mbconv.py)
    rows = g.shape[0] * wo
    part = jnp.dot(
        jnp.ones((1, rows), jnp.float32),
        g.astype(jnp.float32).reshape(rows, ce),
        preferred_element_type=jnp.float32,
    )

    @pl.when(i == 0)
    def _init():
        pool_scr[...] = part

    @pl.when(i > 0)
    def _acc():
        pool_scr[...] = pool_scr[...] + part

    @pl.when(i == n_bands - 1)
    def _se():
        total = n_bands * g.shape[0] * wo
        pool = pool_scr[...] / total  # (1, Ce)
        se = jnp.dot(
            pool, se1w_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + se1b_ref[0][None, :]
        se = se * jax.nn.sigmoid(se)
        se = jnp.dot(
            se, se2w_ref[...].astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ) + se2b_ref[0][None, :]
        scale_ref[0] = jax.nn.sigmoid(se)


def _project_kernel(
    g_ref, scale_ref, x_ref, wp_ref, p_s_ref, p_t_ref, out_ref,
    *, residual: bool,
):
    g = g_ref[0]  # (band, Wo, Ce)
    rows, wo, ce = g.shape
    scale = scale_ref[0][0].astype(g.dtype)  # (Ce,)
    g = g * scale[None, None, :]
    y = jnp.dot(
        g.reshape(rows * wo, ce), wp_ref[...],
        preferred_element_type=jnp.float32,
    )
    y = y * p_s_ref[0][None, :] + p_t_ref[0][None, :]
    y = y.astype(g.dtype).reshape(rows, wo, -1)
    if residual:
        y = y + x_ref[0]
    out_ref[0] = y


def _pick_band(ho: int) -> int:
    """Output rows per band: a divisor of Ho targeting ~16-32 rows (small
    enough that the haloed expanded band fits VMEM at 224^2 widths, large
    enough to amortize dispatch)."""
    for cand in (32, 28, 16, 14, 8, 7, 4, 2):
        if ho % cand == 0 and cand <= ho:
            return cand
    return ho


@functools.partial(
    jax.jit, static_argnames=("kernel", "stride", "residual", "band_rows")
)
def banded_mbconv_infer(
    x: jax.Array,
    params: MBConvParams,
    *,
    kernel: int,
    stride: int,
    residual: bool,
    band_rows: int = 0,
) -> jax.Array:
    """Two-pass banded fused MBConv. x: (B, H, W, Cin); returns
    (B, H/stride, W/stride, Cout) in x.dtype. H, W must be even for
    stride 2; band_rows=0 picks a divisor of the output height."""
    b, hh, ww, cin = x.shape
    has_expand = params.we is not None
    ce = params.dw.shape[-1]
    cout = params.wp.shape[-1]
    ho, wo = hh // stride, ww // stride
    dt = x.dtype
    p = kernel // 2

    band = band_rows or _pick_band(ho)
    if ho % band:
        raise ValueError(f"band_rows {band} must divide output height {ho}")
    n_bands = ho // band
    in_len = stride * band + 2 * p

    # Haloed band windows are materialized OUTSIDE the kernel (cheap XLA
    # gather, ~2p/band extra traffic on the small un-expanded x) and fed
    # through standard BlockSpec pipelining: manual DMA from HBM requires
    # 128-aligned slices on the lane dim (observed on v5e: "Slice shape
    # along dimension 3 must be aligned to tiling (128)"), which the
    # narrow early-stage channel counts can never satisfy.
    #   band i input rows (padded coords, top pad = p):
    #     stride 1: [i*band, i*band + band + 2p)
    #     stride 2: [2*i*band + 1, 2*i*band + 2*band + 2p)  (asymmetric SAME)
    top = p
    needed = stride * (ho - band) + (stride - 1) + in_len
    x_pad = jnp.pad(
        x, ((0, 0), (top, max(0, needed - top - hh)), (0, 0), (0, 0))
    )
    offs = stride * band * jnp.arange(n_bands) + (stride - 1)
    rows = offs[:, None] + jnp.arange(in_len)[None, :]  # (n_bands, in_len)
    x_bands = x_pad[:, rows]  # (B, n_bands, in_len, W, Cin)

    if has_expand:
        we = params.we.astype(dt)
        e_s = params.e_scale.astype(jnp.float32).reshape(1, -1)
        e_t = params.e_shift.astype(jnp.float32).reshape(1, -1)
    else:
        we = jnp.zeros((cin, ce), dt)
        e_s = jnp.zeros((1, ce), jnp.float32)
        e_t = jnp.zeros((1, ce), jnp.float32)

    v2 = lambda a: a.reshape(1, -1)
    full = lambda shape: pl.BlockSpec(
        shape, lambda b_, i_: tuple(0 for _ in shape), memory_space=pltpu.VMEM
    )

    g, scale = pl.pallas_call(
        functools.partial(
            _expand_dw_kernel, k=kernel, stride=stride, has_expand=has_expand,
            band=band, n_bands=n_bands, in_len=in_len, hh=hh, wi=ww, wo=wo,
            cin=cin,
        ),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec((1, 1, in_len, ww, cin),
                         lambda b_, i_: (b_, i_, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((cin, ce)), full((1, ce)), full((1, ce)),
            full((kernel, kernel, ce)), full((1, ce)), full((1, ce)),
            full(params.se_w1.shape), full((1, params.se_b1.shape[0])),
            full(params.se_w2.shape), full((1, ce)),
        ],
        out_specs=[
            pl.BlockSpec((1, band, wo, ce), lambda b_, i_: (b_, i_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ce), lambda b_, i_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_shape=[
            jax.ShapeDtypeStruct((b, ho, wo, ce), dt),
            jax.ShapeDtypeStruct((b, 1, ce), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((1, ce), jnp.float32),
        ],
        interpret=_interpret(),
    )(
        x_bands, we, e_s, e_t,
        params.dw.astype(dt),
        v2(params.d_scale.astype(jnp.float32)),
        v2(params.d_shift.astype(jnp.float32)),
        params.se_w1.astype(dt), v2(params.se_b1.astype(jnp.float32)),
        params.se_w2.astype(dt), v2(params.se_b2.astype(jnp.float32)),
    )

    # pass 2: scale + project (+ residual); x re-banded without halo
    x_in = x if residual else jnp.zeros((b, ho, wo, 1), dt)
    xc = x_in.shape[-1]
    y = pl.pallas_call(
        functools.partial(_project_kernel, residual=residual),
        grid=(b, n_bands),
        in_specs=[
            pl.BlockSpec((1, band, wo, ce), lambda b_, i_: (b_, i_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, ce), lambda b_, i_: (b_, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, band, wo, xc), lambda b_, i_: (b_, i_, 0, 0),
                         memory_space=pltpu.VMEM),
            full((ce, cout)), full((1, cout)), full((1, cout)),
        ],
        out_specs=pl.BlockSpec(
            (1, band, wo, cout), lambda b_, i_: (b_, i_, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), dt),
        interpret=_interpret(),
    )(
        g, scale, x_in,
        params.wp.astype(dt),
        v2(params.p_scale.astype(jnp.float32)),
        v2(params.p_shift.astype(jnp.float32)),
    )
    return y
