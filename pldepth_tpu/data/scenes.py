"""Structured synthetic scenes: piecewise-smooth depth with true occlusion
boundaries + textured images.

The plain ``synthetic`` dataset (datasets.py) draws smooth low-frequency
fields — fine for throughput/loss plumbing, but it leaves every
edge-dependent subsystem under-exercised: the depth-edge metrics
(eval/metrics.py depth_edge_metric, reference
pldepth/active_learning/metrics.py:123-155) see no Canny edges on smooth
depth, and the active-learning acquisition (reference
active_learning_method.py:22-56) is *entirely* edge-driven. This module
generates scenes the way a graphics test would: a tilted smooth background
plane with N opaque objects (rotated ellipses / rectangles) composited
front-to-back by inverse depth (painter's algorithm via per-pixel max), each
region carrying a distinct albedo + mild texture so image Canny edges align
with true depth discontinuities.

Everything is deterministic per (seed, index) and returns the uniform sample
dict ``{"image", "gt", "mask"}`` of the dataset registry. ``gt`` is inverse
depth in (0.05, 1.0], *descending* convention (higher = closer), matching
HR-WSI semantics (reference pl_hourglass.py:22-31).

``true_boundary_map`` recomputes the exact occlusion-boundary set from a gt
map — tests use it to score whether acquisition/metrics actually key on real
depth structure.
"""

from __future__ import annotations

from typing import Dict, Tuple

import numpy as np

from pldepth_tpu.data import io as dio


def _coords(h: int, w: int) -> Tuple[np.ndarray, np.ndarray]:
    yy, xx = np.meshgrid(
        np.linspace(-1.0, 1.0, h, dtype=np.float32),
        np.linspace(-1.0, 1.0, w, dtype=np.float32),
        indexing="ij",
    )
    return yy, xx


def _low_freq(rng: np.random.Generator, hw: Tuple[int, int], cells: int = 6,
              amp: float = 1.0) -> np.ndarray:
    """Band-limited noise in [-amp, amp] (bilinear upsample of a coarse grid)."""
    coarse = rng.normal(size=(cells, cells)).astype(np.float32)
    field = dio.resize_bilinear(coarse[..., None], hw)[..., 0]
    m = max(float(np.abs(field).max()), 1e-6)
    return field * (amp / m)


def _object_sdf(rng: np.random.Generator, yy: np.ndarray, xx: np.ndarray):
    """Signed inside-mask of one random rotated ellipse or rectangle."""
    cy, cx = rng.uniform(-0.75, 0.75, size=2)
    ry = rng.uniform(0.12, 0.45)
    rx = rng.uniform(0.12, 0.45)
    theta = rng.uniform(0.0, np.pi)
    ct, st = np.cos(theta), np.sin(theta)
    u = (yy - cy) * ct - (xx - cx) * st
    v = (yy - cy) * st + (xx - cx) * ct
    if rng.uniform() < 0.5:  # ellipse
        inside = (u / ry) ** 2 + (v / rx) ** 2 <= 1.0
    else:  # rectangle
        inside = (np.abs(u) <= ry) & (np.abs(v) <= rx)
    return inside


def generate_scene(
    index: int,
    image_size: int = 224,
    seed: int = 0,
    n_objects_range: Tuple[int, int] = (3, 8),
    mask_frac: float = 0.97,
) -> Dict[str, np.ndarray]:
    """One deterministic scene: returns {"image", "gt", "mask"} plus the
    integer region-id map under "segments" (background = 0) for tests."""
    h = w = image_size
    rng = np.random.default_rng((seed * 1_000_003 + index) * 2 + 1)
    yy, xx = _coords(h, w)

    # background: far tilted plane + gentle relief, inverse depth 0.05-0.35
    gy, gx = rng.uniform(-0.08, 0.08, size=2)
    gt = 0.18 + gy * yy + gx * xx + _low_freq(rng, (h, w), cells=5, amp=0.06)
    gt = np.clip(gt, 0.05, 0.35).astype(np.float32)
    segments = np.zeros((h, w), np.int32)

    n_obj = int(rng.integers(n_objects_range[0], n_objects_range[1] + 1))
    # objects get strictly increasing closeness bands so every overlap is a
    # real occlusion with a depth jump; within an object the surface is a
    # slightly tilted plane + mild relief (smooth, but not constant)
    bands = np.linspace(0.42, 0.95, n_obj)
    for k in range(n_obj):
        inside = _object_sdf(rng, yy, xx)
        oy, ox = rng.uniform(-0.05, 0.05, size=2)
        depth_k = bands[k] + oy * yy + ox * xx + _low_freq(
            rng, (h, w), cells=4, amp=0.02
        )
        depth_k = np.clip(depth_k, 0.36, 1.0).astype(np.float32)
        closer = inside & (depth_k > gt)
        gt = np.where(closer, depth_k, gt)
        segments = np.where(closer, np.int32(k + 1), segments)

    # image: per-region albedo (well-separated grays survive medianBlur(15))
    # + low-frequency texture + depth-correlated shading so image Canny edges
    # coincide with the occlusion boundaries
    albedos = rng.permutation(np.linspace(0.15, 0.9, n_obj + 1)).astype(np.float32)
    base = albedos[segments]
    texture = _low_freq(rng, (h, w), cells=12, amp=0.05)
    shade = 0.15 * (gt - gt.mean())
    lum = np.clip(base + texture + shade, 0.02, 1.0)
    tint = rng.uniform(0.85, 1.15, size=3).astype(np.float32)
    image = np.clip(lum[..., None] * tint[None, None, :], 0.0, 1.0).astype(
        np.float32
    )

    mask = (rng.uniform(size=(h, w)) < mask_frac).astype(np.float32)
    mask[0, 0] = 1.0
    return {"image": image, "gt": gt, "mask": mask, "segments": segments}


def true_boundary_map(gt: np.ndarray, jump: float = 0.04) -> np.ndarray:
    """Binary map of true depth discontinuities: pixels whose 4-neighborhood
    inverse-depth jump exceeds ``jump`` (occlusion boundaries; the smooth
    within-region gradients sit well below it)."""
    b = np.zeros_like(gt, dtype=bool)
    dy = np.abs(np.diff(gt, axis=0)) > jump
    dx = np.abs(np.diff(gt, axis=1)) > jump
    b[:-1, :] |= dy
    b[1:, :] |= dy
    b[:, :-1] |= dx
    b[:, 1:] |= dx
    return b


def boundary_distance(gt: np.ndarray, jump: float = 0.04) -> np.ndarray:
    """Distance (pixels) from each pixel to the nearest true boundary.
    Euclidean via cv2 if present, else an exact two-pass chamfer fallback."""
    b = true_boundary_map(gt, jump)
    if not b.any():
        return np.full(gt.shape, np.inf, np.float32)
    try:
        import cv2

        # distanceTransform measures to the nearest zero pixel
        src = (~b).astype(np.uint8)
        return cv2.distanceTransform(src, cv2.DIST_L2, 5).astype(np.float32)
    except Exception:  # pragma: no cover - cv2 is in the image
        from scipy.ndimage import distance_transform_edt

        return distance_transform_edt(~b).astype(np.float32)


def SceneDepthDataset(
    n: int = 64,
    image_size: int = 224,
    seed: int = 0,
    mask_frac: float = 0.97,
):
    """Registry-compatible structured-scene dataset (name ``scenes``)."""
    from pldepth_tpu.data.datasets import DepthDataset

    def load(i: int) -> Dict[str, np.ndarray]:
        s = generate_scene(i, image_size, seed, mask_frac=mask_frac)
        # the uniform sample contract is image/gt/mask; segments stays an
        # opt-in extra for tests that need region identity
        return {"image": s["image"], "gt": s["gt"], "mask": s["mask"]}

    return DepthDataset(name="scenes", size=n, loader=load)
