"""Active-learning acquisition: tile Hausdorff correctness + oracle labels."""

import numpy as np
import pytest
from scipy.spatial import cKDTree

from pldepth_tpu.active.acquisition import oracle_label, tile_hausdorff, _tileize


def brute_hausdorff(a_img, b_img):
    """scipy cKDTree reference (the reference's own method, metrics.py:9-22)."""
    a_pts = np.transpose(np.nonzero(a_img))
    b_pts = np.transpose(np.nonzero(b_img))
    if len(a_pts) == 0 or len(b_pts) == 0:
        return None
    return max(
        cKDTree(a_pts).query(b_pts, k=1)[0].max(),
        cKDTree(b_pts).query(a_pts, k=1)[0].max(),
    )


def test_tile_hausdorff_matches_ckdtree(rng):
    h = w = 32
    split = 4  # tiles of 8x8
    a = (rng.uniform(size=(h, w)) < 0.15).astype(np.uint8) * 255
    b = (rng.uniform(size=(h, w)) < 0.15).astype(np.uint8) * 255
    dist, pts = tile_hausdorff(a, b, split)
    a_tiles = _tileize(a, split)
    b_tiles = _tileize(b, split)
    for t in range(split * split):
        want = brute_hausdorff(a_tiles[t], b_tiles[t])
        if want is not None:
            np.testing.assert_allclose(dist[t], want, rtol=1e-6)
        else:
            np.testing.assert_allclose(dist[t], np.sqrt(2) * (h // split))


def test_tile_hausdorff_witness_is_input_edge_pixel(rng):
    h = w = 32
    split = 4
    a = (rng.uniform(size=(h, w)) < 0.2).astype(np.uint8) * 255
    b = (rng.uniform(size=(h, w)) < 0.2).astype(np.uint8) * 255
    dist, pts = tile_hausdorff(a, b, split)
    a_tiles = _tileize(a, split)
    t = h // split
    for i, (r, c) in enumerate(pts):
        tile_has_a = a_tiles[i].any()
        tile_has_b = _tileize(b, split)[i].any()
        if tile_has_a and tile_has_b:
            assert a[r, c] > 0, f"witness not on an input edge (tile {i})"
        # coordinates stay inside the tile
        assert (i // split) * t <= r < (i // split + 1) * t
        assert (i % split) * t <= c < (i % split + 1) * t


def test_oracle_label_sorted_and_consistent(rng):
    gt = rng.uniform(0.1, 1.0, (32, 32)).astype(np.float32)
    pts = np.stack(
        [rng.integers(0, 32, 64), rng.integers(0, 32, 64)], axis=1
    ).astype(np.int64)
    lists = oracle_label(gt, pts, ranking_size=4, rng=np.random.default_rng(0))
    assert lists.shape == (16, 4, 2)
    d = lists[..., 1]
    assert np.all(np.diff(d, axis=-1) <= 1e-7)
    flat = lists[..., 0].astype(int)
    np.testing.assert_allclose(d, gt.reshape(-1)[flat], rtol=1e-6)


def test_tile_hausdorff_nonsquare(rng):
    """Portrait/landscape maps must tile cleanly (the reference splitImage
    assumed square inputs); witnesses stay in bounds for both."""
    from pldepth_tpu.active.acquisition import tile_hausdorff

    for h, w in ((64, 48), (48, 64)):
        a = (rng.random((h, w)) > 0.9).astype(np.uint8) * 255
        b = (rng.random((h, w)) > 0.9).astype(np.uint8) * 255
        dist, pts = tile_hausdorff(a, b, split=8)
        assert dist.shape == (64,)
        assert pts.shape == (64, 2)
        assert (pts[:, 0] >= 0).all() and (pts[:, 0] < h).all()
        assert (pts[:, 1] >= 0).all() and (pts[:, 1] < w).all()
        # witnesses from valid tiles are input-edge pixels
        on = a[pts[:, 0], pts[:, 1]]
        assert ((on > 0) | (dist == np.hypot(h // 8, w // 8))).any()
