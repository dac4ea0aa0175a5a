"""Sparse decoder tail: evaluate the full-resolution head only at sampled pixels.

Training with the Plackett-Luce ranking loss reads the predicted depth map at
only ``rankings_per_image * ranking_size`` pixels per image (e.g. 500 of the
448*448 = 200k pixels at the headline config) — yet the reference decoder
(pldepth/models/pl_hourglass.py:59-98) materializes the full-resolution map
every step. This module makes that tail optional.

Measured outcome (docs/BENCH.md): at the headline config the sparse path is
*slower* on TPU (158.6 vs 113.3 ms/step) — the per-pixel gathers and their
scatter-add backward cost more than the ~2.4 GB of full-res tensor traffic
they remove. It is therefore **off by default**; it remains a correct,
tested sampled-pixel evaluation API (useful for point-query serving, and
potentially a win at resolutions where the full-res tail dominates).

This module computes the tail *sparsely and exactly*:

* everything through the last BatchNorm stays dense (at <= 1/2 resolution),
  so train-mode batch statistics, running-stat updates, and their gradients
  are bit-identical to the dense path;
* the final ``upsample2x_bilinear`` + 3x3 SAME head conv are replaced by a
  per-pixel gather of the 4-tap bilinear sources for each of the 9 conv taps
  (``sparse_upsample2x_taps``), against which the *same* Flax conv module is
  applied — identical parameters, identical math, evaluated at N points
  instead of H*W.

Exactness: the bilinear kernel reproduces ``jax.image.resize(..., bilinear,
antialias=False)`` half-pixel semantics including edge clamping (verified in
tests/test_sparse_tail.py against the dense path, borders included); SAME
zero-padding at image borders is reproduced by the validity mask. In float32
the sparse and dense paths agree to ~1e-6; in bfloat16 they differ only by
accumulation-order rounding.
"""

from __future__ import annotations

import jax.numpy as jnp


def _bilinear2x_taps_1d(p, size_in):
    """4-tap bilinear source indices/weights for 2x upsampling, one axis.

    ``p``: int32 output-space coordinates (may be out of range — callers mask
    them). Matches ``jax.image.resize`` half-pixel centers: the output pixel
    ``p`` samples input coordinate ``t = p/2 - 0.25``; source indices are
    ``floor(t)`` and ``floor(t)+1`` clamped to the valid range (edge clamp).

    Returns ``(i0, i1, frac)``: the two clamped source indices and the weight
    of ``i1`` (weight of ``i0`` is ``1 - frac``).
    """
    t = p.astype(jnp.float32) / 2.0 - 0.25
    lo = jnp.floor(t)
    frac = t - lo
    lo = lo.astype(jnp.int32)
    i0 = jnp.clip(lo, 0, size_in - 1)
    i1 = jnp.clip(lo + 1, 0, size_in - 1)
    return i0, i1, frac


def sparse_upsample2x_taps(x, pixels, window: int = 3):
    """Gather ``window x window`` patches of ``upsample2x_bilinear(x)``.

    For each output-resolution pixel ``(r, c)`` this returns the values the
    dense path's upsampled map would have at the ``window x window``
    neighborhood centered there, with out-of-image taps set to zero (SAME
    conv zero-padding semantics). A 3x3 SAME conv applied to the returned
    patch therefore has, at its center, exactly the dense conv's output at
    ``(r, c)``.

    Args:
      x: (B, H2, W2, C) half-resolution feature map.
      pixels: (B, N, 2) int32 full-resolution (row, col) coordinates.
      window: conv window the caller will apply (3 for a 3x3 head, 1 for a
        1x1 head).

    Returns:
      (B, N, window, window, C) patches, dtype of ``x``.
    """
    b, h2, w2, c = x.shape
    h, w = 2 * h2, 2 * w2
    n = pixels.shape[1]
    d = jnp.arange(window, dtype=jnp.int32) - window // 2
    pr = pixels[..., 0].astype(jnp.int32)[..., None] + d  # (B, N, win)
    pc = pixels[..., 1].astype(jnp.int32)[..., None] + d
    valid = (
        ((pr >= 0) & (pr < h))[..., :, None] & ((pc >= 0) & (pc < w))[..., None, :]
    )  # (B, N, win, win)

    i0r, i1r, fr = _bilinear2x_taps_1d(pr, h2)
    i0c, i1c, fc = _bilinear2x_taps_1d(pc, w2)

    xf = x.reshape(b, h2 * w2, c)

    def take(ir, ic):
        idx = ir[..., :, None] * w2 + ic[..., None, :]  # (B, N, win, win)
        g = jnp.take_along_axis(xf, idx.reshape(b, -1)[..., None], axis=1)
        return g.reshape(b, n, window, window, c)

    fr = fr[..., :, None, None].astype(x.dtype)  # weight of i1r
    fc = fc[..., None, :, None].astype(x.dtype)
    one = jnp.ones((), x.dtype)
    tap = (one - fr) * ((one - fc) * take(i0r, i0c) + fc * take(i0r, i1c)) + fr * (
        (one - fc) * take(i1r, i0c) + fc * take(i1r, i1c)
    )
    return tap * valid[..., None].astype(x.dtype)
