"""Edge-disagreement acquisition for active learning.

Rebuild of the reference acquisition pipeline
(pldepth/active_learning/active_learning_method.py:22-119 +
preprocess_utils.py): compare Canny edges of the input image against Canny
edges of the (unsharp-masked) predicted depth map; where they disagree most
(per-tile Hausdorff distance), query the oracle.

Differences from the reference, by design:

* Inference is batched on device (the reference called ``model.predict`` one
  image at a time, active_learning_method.py:101 — the dominant cost).
* The per-tile Hausdorff distance + witness pair is computed for *all* tiles
  at once with one masked (T, t^2, t^2) min/max reduction over a precomputed
  within-tile distance matrix, instead of two cKDTree builds per tile
  (metrics.py:9-57). Identical values; orders of magnitude fewer Python
  round trips.
"""

from __future__ import annotations

import functools
import math
from typing import Tuple

import numpy as np

from pldepth_tpu.eval.metrics import auto_canny, _minmax

try:
    import cv2
except Exception:  # pragma: no cover
    cv2 = None


def _tileize(edges: np.ndarray, split: int) -> np.ndarray:
    """(H, W) -> (split*split, th, tw) row-major tiles (reference splitImage,
    preprocess_utils.py:29-42; generalized to non-square images — the
    reference reshape assumed H == W and crashed/cropped otherwise)."""
    h, w = edges.shape
    th, tw = h // split, w // split
    tiles = edges[: th * split, : tw * split].reshape(split, th, split, tw)
    return tiles.transpose(0, 2, 1, 3).reshape(split * split, th, tw)


def tile_hausdorff(
    in_edges: np.ndarray, pred_edges: np.ndarray, split: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Per-tile symmetric Hausdorff distance + input-edge witness point.

    Returns (dist (T,), points (T, 2) absolute row/col), with the reference's
    fallbacks: both-empty tiles get the tile-diagonal distance and a
    center/random-edge point (active_learning_method.py:37-48).
    """
    a_tiles = _tileize(in_edges, split) > 0
    b_tiles = _tileize(pred_edges, split) > 0
    n_tiles, th, tw = a_tiles.shape
    a = a_tiles.reshape(n_tiles, th * tw)
    b = b_tiles.reshape(n_tiles, th * tw)

    # within-tile pairwise distances, shared across tiles
    rr, cc = np.divmod(np.arange(th * tw), tw)
    d = np.hypot(rr[:, None] - rr[None, :], cc[:, None] - cc[None, :]).astype(
        np.float32
    )  # (t^2, t^2)

    big = np.float32(1e9)
    # d(a_i, B) per tile: min over j in B
    d_ab = np.where(b[:, None, :], d[None, :, :], big).min(axis=2)  # (T, t^2)
    d_ab = np.where(a, d_ab, -1.0)  # only A pixels count
    d_ba = np.where(a[:, None, :], d[None, :, :], big).min(axis=2)
    d_ba = np.where(b, d_ba, -1.0)

    h_ab = d_ab.max(axis=1)  # max over A of min-dist to B
    h_ba = d_ba.max(axis=1)
    hd = np.maximum(h_ab, h_ba)

    a_star = d_ab.argmax(axis=1)
    b_star = d_ba.argmax(axis=1)
    # when the B side dominates, witness = A-pixel nearest the extreme B-pixel
    d_rows = d[b_star]  # (T, t^2): distance from b_star cell to every cell
    d_rows = np.where(a, d_rows, big)
    a_near_b = d_rows.argmin(axis=1)
    witness = np.where(h_ab >= h_ba, a_star, a_near_b)

    empty_a = ~a.any(axis=1)
    empty_b = ~b.any(axis=1)
    both_valid = ~(empty_a | empty_b)
    diag = math.hypot(th, tw)

    dist = np.where(both_valid, hd, diag)
    # fallback witness: center of tile if A empty, else first A pixel
    center = (th // 2) * tw + tw // 2
    first_a = np.where(a.any(axis=1), a.argmax(axis=1), center)
    witness = np.where(both_valid, witness, np.where(empty_a, center, first_a))

    # to absolute image coordinates
    tile_r, tile_c = np.divmod(np.arange(n_tiles), split)
    wr = tile_r * th + witness // tw
    wc = tile_c * tw + witness % tw
    pts = np.stack([wr, wc], axis=1).astype(np.int64)
    return dist.astype(np.float32), pts


@functools.lru_cache(maxsize=8)
def _device_hausdorff_fn(split: int, h: int, w: int):
    """Jitted batched tile-Hausdorff: (B, H, W) edge-map pairs -> per-tile
    distance + witness. Same values as :func:`tile_hausdorff` (gated by
    tests/test_active.py::test_device_hausdorff_matches_numpy); the masked
    (T, t^2, t^2) min/max reductions are pure VPU work, so on TPU the whole
    predict batch costs ~a millisecond where the numpy version costs
    ~0.2-0.7 s *per image* on this host (docs/BENCH.md "Active learning").
    """
    import jax
    import jax.numpy as jnp

    th, tw = h // split, w // split
    t2 = th * tw
    n_tiles = split * split
    rr, cc = np.divmod(np.arange(t2), tw)
    d_const = np.hypot(rr[:, None] - rr[None, :], cc[:, None] - cc[None, :]).astype(
        np.float32
    )
    big = np.float32(1e9)
    diag = np.float32(math.hypot(th, tw))
    center = np.int32((th // 2) * tw + tw // 2)
    tile_r, tile_c = np.divmod(np.arange(n_tiles), split)

    def one(in_edges, pred_edges):
        d = jnp.asarray(d_const)
        a = _tileize_jnp(in_edges, split, th, tw) > 0  # (T, t2)
        b = _tileize_jnp(pred_edges, split, th, tw) > 0

        d_ab = jnp.where(b[:, None, :], d[None, :, :], big).min(axis=2)
        d_ab = jnp.where(a, d_ab, -1.0)
        d_ba = jnp.where(a[:, None, :], d[None, :, :], big).min(axis=2)
        d_ba = jnp.where(b, d_ba, -1.0)

        h_ab = d_ab.max(axis=1)
        h_ba = d_ba.max(axis=1)
        hd = jnp.maximum(h_ab, h_ba)

        a_star = jnp.argmax(d_ab, axis=1)
        b_star = jnp.argmax(d_ba, axis=1)
        d_rows = jnp.where(a, d[b_star], big)
        a_near_b = jnp.argmin(d_rows, axis=1)
        witness = jnp.where(h_ab >= h_ba, a_star, a_near_b)

        empty_a = ~a.any(axis=1)
        empty_b = ~b.any(axis=1)
        both_valid = ~(empty_a | empty_b)
        dist = jnp.where(both_valid, hd, diag)
        first_a = jnp.where(a.any(axis=1), jnp.argmax(a, axis=1), center)
        witness = jnp.where(
            both_valid, witness, jnp.where(empty_a, center, first_a)
        ).astype(jnp.int32)

        wr = jnp.asarray(tile_r, jnp.int32) * th + witness // tw
        wc = jnp.asarray(tile_c, jnp.int32) * tw + witness % tw
        return dist.astype(jnp.float32), jnp.stack([wr, wc], axis=1)

    def batched(in_edges, pred_edges):
        # lax.map (not vmap): bounds the (T, t^2, t^2) transient to one
        # image at a time (~160 MB at 448^2/split 32) instead of B of them.
        return jax.lax.map(lambda ab: one(*ab), (in_edges, pred_edges))

    return jax.jit(batched)


def _tileize_jnp(edges, split, th, tw):
    import jax.numpy as jnp

    tiles = edges[: th * split, : tw * split].reshape(split, th, split, tw)
    return jnp.transpose(tiles, (0, 2, 1, 3)).reshape(split * split, th * tw)


def tile_hausdorff_batch(
    in_edges: np.ndarray, pred_edges: np.ndarray, split: int
) -> Tuple[np.ndarray, np.ndarray]:
    """Batched, device-side :func:`tile_hausdorff`.

    ``in_edges``/``pred_edges``: (B, H, W) uint8 edge maps. Returns
    (dist (B, T) f32, pts (B, T, 2) int — absolute row/col witnesses),
    numerically identical to the per-image numpy path.
    """
    b, h, w = in_edges.shape
    # Bucket the leading dim to the next power of two: the jit is cached per
    # (split, h, w) but would otherwise retrace for every distinct batch size
    # (dedup-shrunk and final partial batches), costing an extra compile or
    # two per acquisition round. Pad rows are empty edge maps (cheap:
    # lax.map is per-image) and their outputs are sliced off.
    b_pad = 1 << max(0, (b - 1).bit_length())
    if b_pad != b:
        pad = ((0, b_pad - b), (0, 0), (0, 0))
        in_edges = np.pad(in_edges, pad)
        pred_edges = np.pad(pred_edges, pad)
    fn = _device_hausdorff_fn(split, h, w)
    dist, pts = fn(np.ascontiguousarray(in_edges), np.ascontiguousarray(pred_edges))
    return np.asarray(dist)[:b], np.asarray(pts)[:b].astype(np.int64)


def input_edge_map(image: np.ndarray) -> np.ndarray:
    """Canny edges of the input image (reference preprocessing chain:
    gray -> minmax -> medianBlur(15) -> auto-Canny)."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("active learning acquisition requires OpenCV")
    gray = cv2.cvtColor((image * 255).astype(np.uint8), cv2.COLOR_RGB2GRAY)
    gray = _minmax(gray.astype(np.float32), 0, 255).astype(np.uint8)
    gray = cv2.medianBlur(gray, 15)
    return auto_canny(gray)


def pred_edge_map(pred: np.ndarray, sigma: float = 1.8) -> np.ndarray:
    """Canny edges of the predicted depth (minmax -> unsharp -> auto-Canny)."""
    if cv2 is None:  # pragma: no cover
        raise RuntimeError("active learning acquisition requires OpenCV")
    pred_u8 = _minmax(np.squeeze(pred).astype(np.float32), 0, 255)
    blurred = cv2.GaussianBlur(pred_u8, (5, 5), 1.0)
    sharp = np.clip(4.0 * pred_u8 - 3.0 * blurred, 0, 255).round().astype(np.uint8)
    return auto_canny(sharp, sigma=sigma)


def acquire_pixels(
    image: np.ndarray,
    pred: np.ndarray,
    split: int = 32,
    sigma: float = 1.8,
) -> Tuple[np.ndarray, np.ndarray, float, float]:
    """One image -> (flat positions, (row, col) points, mean dist, var dist).

    Edge extraction mirrors the reference (active_learning_method.py:94-105):
    input: gray -> minmax -> medianBlur(15) -> auto-Canny; prediction:
    minmax -> unsharp mask -> auto-Canny(sigma).
    """
    h, w = image.shape[:2]
    in_edges = input_edge_map(image)
    pred_edges = pred_edge_map(pred, sigma)

    dist, pts = tile_hausdorff(in_edges, pred_edges, split)
    order = np.argsort(dist)  # ascending, as the reference sorts (:51)
    dist, pts = dist[order], pts[order]
    pos = (pts[:, 0] * w + pts[:, 1]).astype(np.int64)
    return pos, pts, float(dist.mean()), float(dist.var())


def oracle_label(
    gt: np.ndarray,
    pts: np.ndarray,
    ranking_size: int,
    rng: np.random.Generator,
) -> np.ndarray:
    """Group acquired pixels into K-lists labeled with ground-truth depth.

    Reference ``oracle`` (active_learning_method.py:59-76): shuffle, chunk
    into ranking_size lists, label with gt, sort each list depth-descending.
    Returns (n_lists, K, 2) float32 [flat_idx, depth].
    """
    h, w = gt.shape
    pts = pts.copy()
    rng.shuffle(pts)
    k = ranking_size
    n_lists = pts.shape[0] // k
    pts = pts[: n_lists * k]
    flat = (pts[:, 0] * w + pts[:, 1]).astype(np.float32).reshape(n_lists, k)
    depths = gt[pts[:, 0], pts[:, 1]].astype(np.float32).reshape(n_lists, k)
    order = np.argsort(-depths, axis=1)
    return np.stack(
        [np.take_along_axis(flat, order, axis=1),
         np.take_along_axis(depths, order, axis=1)],
        axis=-1,
    )
