"""On-device image resizing with TF2-matching semantics.

The reference resizes with ``tf.image.resize`` (bilinear, half-pixel centers,
no antialias — pldepth/data/dao/hr_wsi.py:65-78) and upsamples with Keras
``UpSampling2D(interpolation='bilinear')`` (same kernel, x2). For WHDR parity
within the 0.5% budget (BASELINE.md) the rebuild matches those semantics:
``jax.image.resize`` with ``method='bilinear', antialias=False`` uses the
identical half-pixel sampling grid. Verified against TF goldens in
tests/test_resize.py.
"""

from __future__ import annotations

from typing import Sequence

import jax


def resize_bilinear(img: jax.Array, size: Sequence[int]) -> jax.Array:
    """Bilinear resize of (..., H, W, C) to (..., size[0], size[1], C)."""
    out_shape = (*img.shape[:-3], int(size[0]), int(size[1]), img.shape[-1])
    return jax.image.resize(img, out_shape, method="bilinear", antialias=False)


def resize_nearest(
    img: jax.Array, size: Sequence[int], channel_last: bool = True
) -> jax.Array:
    """Nearest-neighbor resize (masks; reference hr_wsi.py:73-74).

    2-D inputs are (H, W). Higher ranks are (..., H, W, C) by default; a
    batched channel-less mask stack (B, H, W) must pass
    ``channel_last=False`` — silently treating it as (H, W, C) would
    resample the batch axis and leave W untouched."""
    if img.ndim == 2 or not channel_last:
        out_shape = (*img.shape[:-2], int(size[0]), int(size[1]))
    else:
        out_shape = (*img.shape[:-3], int(size[0]), int(size[1]), img.shape[-1])
    return jax.image.resize(img, out_shape, method="nearest")


def upsample2x_bilinear(x: jax.Array) -> jax.Array:
    """Keras UpSampling2D(interpolation='bilinear') equivalent, NHWC."""
    n, h, w, c = x.shape
    return jax.image.resize(x, (n, 2 * h, 2 * w, c), method="bilinear", antialias=False)
