"""Pallas int8 matmul with fused dequant/activation epilogue (serving).

A 1x1 conv is a matmul over pixels. XLA's int8 conv materializes its int32
accumulator to HBM before the (separately fused) epilogue; this kernel
keeps the accumulator in VMEM and writes only the epilogue result, so HBM
traffic is int8-in + weights + bf16-out. Measured on the real v5e
(chained-difference, docs/BENCH.md round 3):

    (M, K, N) = (100352, 672, 112):  0.505 ms vs 1.043 ms XLA int8 conv
                                     (2.07x), exact to <=1 LSB
    (401408, 24, 144) / (401408, 144, 24): 0.8x -- the MXU pads the
    contraction to 128 lanes, so thin-K shapes LOSE; callers gate on K.

models/quantize.py QuantConv routes its 1x1 stride-1 dense convs here when
``K >= QUANT_PALLAS_MIN_K`` and the pixel count tiles cleanly; everything
else stays on the XLA int8 conv. The f32 epilogue is free (VMEM-resident;
bf16 sigmoid also trips a Mosaic broadcast-verifier bug at this jaxlib).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# Below this contraction depth the 128-lane padding wastes more MXU than
# the saved int32 round-trip: K=144 measured 0.8x, K=672 2.07x.
QUANT_PALLAS_MIN_K = 256

_TILES_M = (1024, 512, 448, 256, 224, 128, 96, 64, 32)


def pick_tile_m(m: int) -> int | None:
    """Largest int8-sublane-aligned tile that divides the pixel count."""
    for t in _TILES_M:
        if m % t == 0:
            return t
    return None


def _kernel(x_ref, w_ref, ws_ref, b_ref, sc_ref, o_ref, *, act, out_dtype):
    acc = jax.lax.dot_general(
        x_ref[:], w_ref[:], (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.int32,
    )
    y = acc.astype(jnp.float32) * (ws_ref[:] * sc_ref[0]) + b_ref[:]
    if act == "swish":
        y = y * jax.nn.sigmoid(y)
    elif act == "relu":
        y = jnp.maximum(y, 0.0)
    o_ref[:] = y.astype(out_dtype)


def quant_matmul(
    x, w_q, w_scale, bias, a_scale, act=None, out_dtype=jnp.bfloat16,
    tile_m: int | None = None, interpret: bool = False,
):
    """(M, K) int8 @ (K, N) int8 -> (M, N) ``out_dtype``.

    Computes ``act(acc * (a_scale * w_scale) + bias)`` with the int32
    accumulator never leaving VMEM. ``act`` in {None, "swish", "relu"}.
    """
    m, k = x.shape
    n = w_q.shape[1]
    tile_m = tile_m or pick_tile_m(m)
    if tile_m is None:
        raise ValueError(f"pixel count {m} has no aligned tile")
    sc = jnp.reshape(jnp.asarray(a_scale, jnp.float32), (1,))
    return pl.pallas_call(
        functools.partial(_kernel, act=act, out_dtype=out_dtype),
        out_shape=jax.ShapeDtypeStruct((m, n), out_dtype),
        grid=(m // tile_m,),
        in_specs=[
            pl.BlockSpec((tile_m, k), lambda i: (i, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((k, n), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec((n,), lambda i: (0,), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
        ],
        out_specs=pl.BlockSpec(
            (tile_m, n), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        interpret=interpret,
    )(
        x,
        w_q,
        jnp.asarray(w_scale, jnp.float32),
        jnp.asarray(bias, jnp.float32),
        sc,
    )
