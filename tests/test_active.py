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


def test_device_hausdorff_matches_numpy(rng):
    """The batched device tile-Hausdorff (active_learning_round's path) must
    reproduce the numpy golden exactly — distances and witness points —
    including empty-tile fallbacks."""
    from pldepth_tpu.active.acquisition import tile_hausdorff_batch

    h = w = 64
    split = 8
    batch = 3
    a = np.stack(
        [(rng.uniform(size=(h, w)) < p).astype(np.uint8) * 255
         for p in (0.02, 0.15, 0.0)]  # sparse, dense, fully empty
    )
    b = np.stack(
        [(rng.uniform(size=(h, w)) < p).astype(np.uint8) * 255
         for p in (0.15, 0.02, 0.1)]
    )
    dist_b, pts_b = tile_hausdorff_batch(a, b, split)
    assert dist_b.shape == (batch, split * split)
    assert pts_b.shape == (batch, split * split, 2)
    for i in range(batch):
        want_d, want_p = tile_hausdorff(a[i], b[i], split)
        np.testing.assert_allclose(dist_b[i], want_d, rtol=1e-6)
        np.testing.assert_array_equal(pts_b[i], want_p)


@pytest.mark.slow
def test_active_learning_round_end_to_end():
    """The pipelined round (async predict prefetch + batched device
    Hausdorff) produces well-formed oracle rankings and a state update."""
    import jax

    from pldepth_tpu.active.loop import active_learning_round, fit_on_fixed_rankings
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.data import SyntheticDepthDataset
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=64, batch_size=4, ranking_size=3,
        rankings_per_image=8, sampling_type=1, compute_dtype="float32",
        listmle_impl="xla",
    )
    trainer = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=6, image_size=64, seed=3)
    images, rankings, stats = active_learning_round(
        trainer, state, ds, split=4, seed=0, predict_batch=4
    )
    assert images.shape == (6, 64, 64, 3)
    n_lists = 16 // cfg.ranking_size  # 16 tiles grouped into K-lists
    assert rankings.shape == (6, n_lists, cfg.ranking_size, 2)
    # oracle lists are depth-descending and index into the image
    assert (np.diff(rankings[..., 1], axis=-1) <= 1e-6).all()
    assert (rankings[..., 0] >= 0).all() and (rankings[..., 0] < 64 * 64).all()
    assert np.isfinite(stats["avg_hd_mean"])
    state2, loss = fit_on_fixed_rankings(trainer, state, images, rankings, steps=1)
    assert np.isfinite(loss)


@pytest.mark.slow
def test_active_round_resident_store_covers_pool():
    """The resident-store round (predict reads images from HBM, device-major
    row order, overlapping tail batch) covers every pool image exactly once
    and returns rows in dataset order."""
    import jax

    from pldepth_tpu.active.loop import active_learning_round
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.data import SyntheticDepthDataset, build_resident_store
    from pldepth_tpu.train import Trainer

    devs = jax.devices()
    if len(devs) < 2:
        pytest.skip("needs 2 virtual devices")
    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=64, batch_size=4, ranking_size=3,
        rankings_per_image=8, sampling_type=1, compute_dtype="float32",
        listmle_impl="xla",
    )
    trainer = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=devs[:2]))
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=6, image_size=64, seed=3)
    store = build_resident_store(ds, trainer.mesh)
    # n_local=3, bl=2 -> starts [0, 1]: the second batch overlaps row 1 of
    # each shard; the dedupe must keep single copies and cover all 6 rows
    images, rankings, stats = active_learning_round(
        trainer, state, ds, split=4, seed=0, predict_batch=4, store=store
    )
    assert images.shape == (6, 64, 64, 3)
    for i in range(6):
        np.testing.assert_array_equal(images[i], ds[i]["image"])
    assert rankings.shape[0] == 6
    assert np.isfinite(stats["avg_hd_mean"])


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
