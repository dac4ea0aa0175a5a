"""Fused inference MBConv: one Pallas kernel per image per block.

The serving forward's dominant cost is the EfficientNet encoder's
per-block intermediate traffic: each MBConv (models/efficientnet.py:93-140,
re-deriving keras.applications.EfficientNetB0 used at reference
pldepth/models/pl_hourglass.py:48) expands C -> 6C, runs a depthwise conv,
SE, and projects back — and the XLA path materializes the 6x-expanded
tensor in HBM several times (expand out, dw in/out, SE scale, project in).

At B0 scale every per-image expanded tensor fits in VMEM (<= 3.6 MB at
448^2 input), so inference can run the ENTIRE block — expand matmul +
folded-BN affine + swish, k x k depthwise via roll-and-mask taps, SE pool
+ MLP + scale, project matmul + affine, residual — in one kernel whose HBM
traffic is exactly `read x + write y` (~19 MB vs ~500 MB for the XLA path
at stage 2). Inference only: BatchNorm uses running stats (a per-channel
affine, folded here); training still uses the XLA path (batch stats and
gradients need the materialized intermediates).

Numerics mirror the XLA path op-for-op (bf16 storage, f32 BN affine and
SE pool/sigmoid, f32 matmul accumulation); agreement is within bf16
rounding (tests/test_fused_mbconv.py).

Stride-2 note: lax SAME padding for stride 2 at even sizes is asymmetric
(pad_left = p-1), so the strided output equals the stride-1 SAME output
subsampled at odd indices: out[i] = g1[2i+1] for both k=3 and k=5.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _interpret() -> bool:
    return jax.default_backend() != "tpu"


class MBConvParams(NamedTuple):
    """Folded inference parameters of one MBConv block.

    BN(v) with running stats is the affine v*s + t with
    s = gamma / sqrt(var + eps), t = beta - mean * s.
    """

    we: Optional[jax.Array]  # (Cin, Ce) expand 1x1 kernel; None if expand==1
    e_scale: Optional[jax.Array]  # (Ce,)
    e_shift: Optional[jax.Array]  # (Ce,)
    dw: jax.Array  # (k, k, Ce) depthwise kernel
    d_scale: jax.Array  # (Ce,)
    d_shift: jax.Array  # (Ce,)
    se_w1: jax.Array  # (Ce, Cse)
    se_b1: jax.Array  # (Cse,)
    se_w2: jax.Array  # (Cse, Ce)
    se_b2: jax.Array  # (Ce,)
    wp: jax.Array  # (Ce, Cout) project 1x1 kernel
    p_scale: jax.Array  # (Cout,)
    p_shift: jax.Array  # (Cout,)


def fold_bn(gamma, beta, mean, var, eps: float = 1e-3):
    s = gamma / jnp.sqrt(var + eps)
    return s, beta - mean * s


def _shift_zero(h, d: int, axis: int):
    """sh[i] = h[i+d] along ``axis`` with zero fill outside (static d).

    Built from static slices + concatenate: Mosaic's ``tpu.dynamic_rotate``
    only supports 32-bit element types (observed on v5e: "Rotate with
    non-32-bit data" for a bf16 vector), so the previous roll-and-mask
    formulation cannot run in the serving dtype."""
    if d == 0:
        return h
    n = h.shape[axis]
    if d > 0:
        body = jax.lax.slice_in_dim(h, d, n, axis=axis)
        pad = jnp.zeros_like(jax.lax.slice_in_dim(h, 0, d, axis=axis))
        return jax.lax.concatenate([body, pad], dimension=axis)
    body = jax.lax.slice_in_dim(h, 0, n + d, axis=axis)
    pad = jnp.zeros_like(jax.lax.slice_in_dim(h, 0, -d, axis=axis))
    return jax.lax.concatenate([pad, body], dimension=axis)


def _dw_taps(h, dw_ref, k: int, acc_dtype):
    """k x k depthwise conv with stride-1 SAME zero padding, computed as
    k^2 shift-and-scale fused multiply-adds over the VMEM-resident tensor
    (row shift hoisted out of the inner loop: k + k^2 shifts total)."""
    p = k // 2
    g = jnp.zeros(h.shape, acc_dtype)
    for di in range(-p, p + 1):
        sh_row = _shift_zero(h, di, 0)
        for dj in range(-p, p + 1):
            w_tap = dw_ref[di + p, dj + p, :]  # (Ce,)
            sh = _shift_zero(sh_row, dj, 1)
            g = g + sh.astype(acc_dtype) * w_tap[None, None, :].astype(acc_dtype)
    return g


def _mbconv_kernel(
    # refs (inputs..., outputs..., scratch...)
    x_ref, we_ref, e_s_ref, e_t_ref, dw_ref, d_s_ref, d_t_ref,
    se1w_ref, se1b_ref, se2w_ref, se2b_ref, wp_ref, p_s_ref, p_t_ref,
    out_ref, h_scr,
    *, k: int, stride: int, residual: bool, has_expand: bool,
    hh: int, ww: int,
):
    x = x_ref[0]  # (H, W, Cin) bf16
    cin = x.shape[-1]
    if has_expand:
        ce = we_ref.shape[-1]
        h = jnp.dot(
            x.reshape(hh * ww, cin), we_ref[...],
            preferred_element_type=jnp.float32,
        )
        h = h * e_s_ref[0][None, :] + e_t_ref[0][None, :]
        h = (h * jax.nn.sigmoid(h)).astype(x.dtype)  # swish, f32 -> bf16
        h = h.reshape(hh, ww, ce)
        h_scr[...] = h
        h = h_scr[...]
    else:
        h = x

    g = _dw_taps(h, dw_ref, k, jnp.float32)  # (H, W, Ce) f32
    g = g * d_s_ref[0][None, None, :] + d_t_ref[0][None, None, :]
    g = g * jax.nn.sigmoid(g)  # swish in f32 (XLA path: bf16; within tol)
    g = g.astype(x.dtype)

    if stride == 2:
        # SAME stride-2 == stride-1 output at odd indices (module docstring)
        ce = g.shape[-1]
        g = g.reshape(hh // 2, 2, ww // 2, 2, ce)[:, 1, :, 1, :]
    ho, wo = g.shape[0], g.shape[1]

    # squeeze-excite: tiny (1, Ce) matmuls, all f32 (Mosaic rejects the
    # mixed bf16/f32 broadcast the narrow dot would otherwise emit).
    # The pool is a ones-vector matmul, not a multi_reduction: the stride-2
    # subsample leaves g with a nonzero sublane offset, and Mosaic refuses
    # float ADD reductions over offset layouts ("input layout must have
    # zero offsets over dimensions that are being reduced", v5e).
    gf = g.astype(jnp.float32).reshape(ho * wo, g.shape[-1])
    pool = jnp.dot(
        jnp.full((1, ho * wo), 1.0 / (ho * wo), jnp.float32), gf,
        preferred_element_type=jnp.float32,
    )  # (1, Ce)
    se = jnp.dot(pool, se1w_ref[...].astype(jnp.float32)) + se1b_ref[0][None, :]
    se = se * jax.nn.sigmoid(se)  # swish
    se = jnp.dot(se, se2w_ref[...].astype(jnp.float32)) + se2b_ref[0][None, :]
    scale = jax.nn.sigmoid(se)[0].astype(x.dtype)  # (Ce,)
    g = g * scale[None, None, :]

    ce = g.shape[-1]
    y = jnp.dot(
        g.reshape(ho * wo, ce), wp_ref[...], preferred_element_type=jnp.float32
    )
    y = y * p_s_ref[0][None, :] + p_t_ref[0][None, :]
    y = y.astype(x.dtype).reshape(ho, wo, -1)
    if residual:
        y = y + x
    out_ref[0] = y


@functools.partial(
    jax.jit, static_argnames=("kernel", "stride", "residual")
)
def fused_mbconv_infer(
    x: jax.Array,
    params: MBConvParams,
    *,
    kernel: int,
    stride: int,
    residual: bool,
) -> jax.Array:
    """Run one inference MBConv block fused. x: (B, H, W, Cin) bf16;
    returns (B, H/stride, W/stride, Cout) in x.dtype."""
    b, hh, ww, cin = x.shape
    has_expand = params.we is not None
    ce = params.dw.shape[-1]
    cout = params.wp.shape[-1]
    ho, wo = hh // stride, ww // stride
    dt = x.dtype

    def v2(a):  # 1-D vector -> (1, C) VMEM block
        return a.reshape(1, -1)

    if has_expand:
        we = params.we.astype(dt)
        e_s, e_t = v2(params.e_scale.astype(jnp.float32)), v2(
            params.e_shift.astype(jnp.float32))
    else:
        # placeholder operands keep the ref list static; kernel ignores them
        we = jnp.zeros((cin, ce), dt)
        e_s = jnp.zeros((1, ce), jnp.float32)
        e_t = jnp.zeros((1, ce), jnp.float32)

    full = lambda shape: pl.BlockSpec(shape, lambda i: tuple(0 for _ in shape),
                                      memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        functools.partial(
            _mbconv_kernel, k=kernel, stride=stride, residual=residual,
            has_expand=has_expand, hh=hh, ww=ww,
        ),
        grid=(b,),
        in_specs=[
            pl.BlockSpec((1, hh, ww, cin), lambda i: (i, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            full((cin, ce)), full((1, ce)), full((1, ce)),
            full((kernel, kernel, ce)), full((1, ce)), full((1, ce)),
            full(params.se_w1.shape), full((1, params.se_b1.shape[0])),
            full(params.se_w2.shape), full((1, ce)),
            full((ce, cout)), full((1, cout)), full((1, cout)),
        ],
        out_specs=pl.BlockSpec((1, ho, wo, cout), lambda i: (i, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((b, ho, wo, cout), dt),
        # token scratch when expand==1: the kernel never touches it, and the
        # planner's VMEM estimate counts it only for expanding blocks
        scratch_shapes=[
            pltpu.VMEM((hh, ww, ce) if has_expand else (1, 1, ce), dt)
        ],
        interpret=_interpret(),
    )(
        x, we, e_s, e_t,
        params.dw.astype(dt),
        v2(params.d_scale.astype(jnp.float32)),
        v2(params.d_shift.astype(jnp.float32)),
        params.se_w1.astype(dt), v2(params.se_b1.astype(jnp.float32)),
        params.se_w2.astype(dt), v2(params.se_b2.astype(jnp.float32)),
        params.wp.astype(dt),
        v2(params.p_scale.astype(jnp.float32)),
        v2(params.p_shift.astype(jnp.float32)),
    )
    return out


def mbconv_infer_ref(x, params: MBConvParams, *, kernel: int, stride: int,
                     residual: bool):
    """jnp reference of the fused block (mirrors models/efficientnet.py
    MBConv inference path op-for-op) for parity tests."""
    dt = x.dtype
    h = x
    if params.we is not None:
        h = jax.lax.conv_general_dilated(
            x, params.we.astype(dt)[None, None], (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        h = h.astype(jnp.float32) * params.e_scale + params.e_shift
        h = h.astype(dt)
        h = h * jax.nn.sigmoid(h)
    ce = h.shape[-1]
    dwk = params.dw.astype(dt).reshape(kernel, kernel, 1, ce)
    g = jax.lax.conv_general_dilated(
        h, dwk, (stride, stride), "SAME", feature_group_count=ce,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    g = g.astype(jnp.float32) * params.d_scale + params.d_shift
    g = g.astype(dt)
    g = g * jax.nn.sigmoid(g)
    pool = jnp.mean(g.astype(jnp.float32), axis=(1, 2), keepdims=True)
    se = jnp.einsum("bijc,cd->bijd", pool.astype(dt), params.se_w1.astype(dt))
    se = se + params.se_b1.astype(dt)
    se = se * jax.nn.sigmoid(se)
    se = jnp.einsum("bijc,cd->bijd", se, params.se_w2.astype(dt))
    se = se + params.se_b2.astype(dt)
    g = g * jax.nn.sigmoid(se.astype(jnp.float32)).astype(dt)
    y = jnp.einsum("bijc,cd->bijd", g, params.wp.astype(dt))
    y = y.astype(jnp.float32) * params.p_scale + params.p_shift
    y = y.astype(dt)
    if residual:
        y = y + x
    return y
