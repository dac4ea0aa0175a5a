"""Fused full-resolution decoder tail: 2x bilinear upsample + 3x3 head conv
collapsed into ONE half-resolution convolution with 4 phase outputs.

Why: the reference decoder (pldepth/models/pl_hourglass.py:96-98) ends with
``UpSampling2D(bilinear)`` to full resolution followed by a 3x3 conv to a
1-channel depth map. On TPU that tail is pathological: the upsample
materializes a full-resolution 32-channel tensor (and forces layout copies
around the resize-as-matmul), and the 1-output-channel conv wastes 127/128
lanes of the MXU/VPU tile. Profiled at 448^2/batch 32 these two ops cost
~10 ms of a ~31 ms forward pass (docs/BENCH.md).

The composition is mathematically a stride-2 transposed convolution, which we
express as a dense 3x3 convolution at HALF resolution with 4 output channels
(one per output-pixel phase) followed by a depth-to-space rearrangement:

With TF half-pixel bilinear 2x upsampling, output row ``r`` samples input
coordinate ``r/2 - 0.25``:

    u(2i)   = 0.25 x[i-1] + 0.75 x[i]
    u(2i+1) = 0.75 x[i]   + 0.25 x[i+1]

so a 3x3 conv tap window around output row ``2i+di`` touches only input rows
``i-1..i+1``. Folding the per-phase row/col mixing matrices into the head
kernel W (3,3,C,1) yields a composed kernel K (3,3,C,4). The interior of the
output is then exactly ``depth_to_space(conv3x3(x, K))``.

Borders: the upsample *clamps* at image edges while the head conv *zero-pads*
in the upsampled domain; both effects only reach the outermost TWO output
rows/cols. Those are patched with the exact two-step computation on 2-pixel
strips of the input (cost is negligible). The result equals the unfused tail
everywhere, up to compute-dtype rounding (bit-exact in float32; ~1e-2 rel in
bfloat16 — see tests/test_fused_tail.py).

All ops are standard lax/jnp, so the fusion is differentiable and the
backward pass gets the same byte savings (the unfused backward's full-res
head gradient was the single hottest op in the train-step profile).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from pldepth_tpu.ops.resize import upsample2x_bilinear

# Row-mixing matrices A[di][conv_tap, input_offset]: the conv tap at offset
# (a-1) from output phase di reads sum_t A[di][a, t] * x[i + t - 1].
_A = np.array(
    [
        [[0.75, 0.25, 0.0], [0.25, 0.75, 0.0], [0.0, 0.75, 0.25]],  # di = 0
        [[0.25, 0.75, 0.0], [0.0, 0.75, 0.25], [0.0, 0.25, 0.75]],  # di = 1
    ],
    dtype=np.float32,
)


def compose_upsample_conv_kernel(w: jax.Array) -> jax.Array:
    """Fold the bilinear-2x kernel into a (3,3,C,F) conv kernel.

    Returns the composed (3,3,C,4F) kernel; output channel ``p*F + f`` with
    ``p = 2*di + dj`` holds the (row-phase di, col-phase dj) output of
    feature ``f`` so that a depth-to-space reshape recovers NHWC order.
    """
    a = jnp.asarray(_A, dtype=jnp.float32)
    w32 = w.astype(jnp.float32)  # (3, 3, C, F)
    # K[di,dj,t,u,c,f] = sum_{a,b} w[a,b,c,f] A[di][a,t] A[dj][b,u]
    k = jnp.einsum("abcf,dat,ebu->detucf", w32, a, a)
    c, f = w32.shape[2], w32.shape[3]
    k = k.reshape(4, 3, 3, c, f)  # (p, 3, 3, C, F)
    return jnp.transpose(k, (1, 2, 3, 0, 4)).reshape(3, 3, c, 4 * f)


def _conv_same(x: jax.Array, w: jax.Array) -> jax.Array:
    return jax.lax.conv_general_dilated(
        x, w, window_strides=(1, 1), padding="SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


def _exact_tail(x: jax.Array, w: jax.Array) -> jax.Array:
    """Reference two-step tail (upsample then conv), without bias."""
    return _conv_same(upsample2x_bilinear(x), w)


def fused_upsample2x_conv(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """``conv3x3(upsample2x_bilinear(x), w) + b`` without materializing the
    upsampled tensor. x: (B, H, W, C); w: (3, 3, C, F); b: (F,).

    Returns (B, 2H, 2W, F) in x.dtype (bias added in x.dtype to mirror
    nn.Conv). For F=1 this is the depth-head tail; for F=C it can fuse an
    interior decoder stage's upsample into the following conv. CAUTION:
    the interior-stage use (decoder conv4, F=32 at 224^2) was MEASURED
    SLOWER on chip than the two-step tail it replaces (serving forward
    25.4 vs 22.5 ms/call): the exact border patch's slice+concatenate of a
    multi-channel full tensor costs more than the avoided resize. Only the
    1-channel head (F=1) is a measured win; the general form is kept for
    point uses where borders don't need patching or F is small.
    """
    n, h, wd, c = x.shape
    f = w.shape[-1]
    if h < 3 or wd < 3:  # degenerate sizes: fall back to the exact path
        return _exact_tail(x, w.astype(x.dtype)) + b.astype(x.dtype)

    kc = compose_upsample_conv_kernel(w).astype(x.dtype)
    ph = _conv_same(x, kc)  # (B, H, W, 4F)
    # depth-to-space: (B,H,W,2,2,F) -> (B,H,2,W,2,F) -> (B, 2H, 2W, F)
    out = ph.reshape(n, h, wd, 2, 2, f)
    out = out.transpose(0, 1, 3, 2, 4, 5).reshape(n, 2 * h, 2 * wd, f)

    # Border patch: the outermost two rows/cols see upsample edge-clamp and
    # conv zero-pad effects the composed kernel cannot express. Recompute
    # them exactly from 2-pixel input strips (upsampling a 2-row slice
    # reproduces the full image's clamped u(0..2) rows exactly).
    wx = w.astype(x.dtype)
    left = _exact_tail(x[:, :, :2, :], wx)[:, :, :2, :]
    right = _exact_tail(x[:, :, -2:, :], wx)[:, :, -2:, :]
    out = jnp.concatenate([left, out[:, :, 2:-2, :], right], axis=2)
    top = _exact_tail(x[:, :2, :, :], wx)[:, :2, :, :]
    bottom = _exact_tail(x[:, -2:, :, :], wx)[:, -2:, :, :]
    out = jnp.concatenate([top, out[:, 2:-2, :, :], bottom], axis=1)
    return out + b.astype(x.dtype)


def fused_upsample2x_head(x: jax.Array, w: jax.Array, b: jax.Array) -> jax.Array:
    """Depth-head (F=1) alias of :func:`fused_upsample2x_conv`."""
    return fused_upsample2x_conv(x, w, b)
