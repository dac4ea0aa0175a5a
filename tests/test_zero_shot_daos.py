"""Zero-shot dataset loaders against tiny fake on-disk trees
(Ibims .mat, TUM .h5, DIODE npy, Sintel png — reference DAO layouts)."""

import os

import numpy as np
import pytest
from PIL import Image

from pldepth_tpu.data.datasets import load_diode, load_ibims, load_sintel, load_tum

S = 24  # source size; loaders resize to target


def _check(ds, n, target):
    assert len(ds) == n
    assert ds.asc_depth_order is True
    s = ds[0]
    assert s["image"].shape == (target, target, 3)
    assert s["gt"].shape == (target, target)
    assert np.all(s["mask"] == 1.0)
    return s


def test_ibims_mat(tmp_path):
    from scipy import io as sio

    rng = np.random.default_rng(0)
    for i in range(2):
        # reference layout: data struct, image at field 2, depth at field 3
        # (ibims.py:19-22)
        data = np.zeros((1, 1), dtype=[
            ("a", "O"), ("b", "O"), ("rgb", "O"), ("depth", "O")
        ])
        data[0, 0]["a"] = np.zeros(1)
        data[0, 0]["b"] = np.zeros(1)
        data[0, 0]["rgb"] = rng.uniform(0, 255, (S, S, 3)).astype(np.float32)
        data[0, 0]["depth"] = rng.uniform(0.5, 10, (S, S)).astype(np.float32)
        sio.savemat(tmp_path / f"im_{i}.mat", {"data": data})
    ds = load_ibims(str(tmp_path), target_size=16)
    _check(ds, 2, 16)


def test_tum_h5(tmp_path):
    import h5py

    rng = np.random.default_rng(1)
    for i in range(2):
        with h5py.File(tmp_path / f"t_{i}.h5", "w") as f:
            g = f.create_group("gt")
            g["img_1"] = rng.uniform(0, 255, (S, S, 3)).astype(np.float32)
            g["pp_depth"] = rng.uniform(0.5, 5, (S, S)).astype(np.float32)
    ds = load_tum(str(tmp_path), target_size=16)
    _check(ds, 2, 16)


def test_diode_npy(tmp_path):
    rng = np.random.default_rng(2)
    d = tmp_path / "val" / "indoors" / "scene_1"
    os.makedirs(d)
    for i in range(2):
        img = (rng.uniform(0, 255, (S, S, 3))).astype(np.uint8)
        Image.fromarray(img).save(d / f"{i:05d}.png")
        np.save(d / f"{i:05d}_depth.npy", rng.uniform(0.5, 8, (S, S, 1)).astype(np.float32))
    ds = load_diode(str(tmp_path), target_size=16)
    _check(ds, 2, 16)


def test_sintel_png(tmp_path):
    rng = np.random.default_rng(3)
    imgs = tmp_path / "images" / "alley_1"
    viz = tmp_path / "depth_viz" / "alley_1"
    os.makedirs(imgs)
    os.makedirs(viz)
    for i in range(2):
        Image.fromarray(rng.uniform(0, 255, (S, S, 3)).astype(np.uint8)).save(
            imgs / f"frame_{i:04d}.png"
        )
        Image.fromarray(rng.uniform(0, 255, (S, S)).astype(np.uint8)).save(
            viz / f"frame_{i:04d}.png"
        )
    ds = load_sintel(str(tmp_path), target_size=16)
    s = _check(ds, 2, 16)
    # depth_viz values are rescaled x255 (sintel.py:31)
    assert s["gt"].max() > 1.5


def test_multihost_sharding_disjoint():
    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset

    ds = SyntheticDepthDataset(n=16, image_size=16, seed=0)
    seen = []
    for shard in range(2):
        it = BatchIterator(
            ds, batch_size=4, seed=7, shuffle=True, loop=False,
            shard_index=shard, num_shards=2,
        )
        for batch in it:
            # full-array checksum as a (collision-free) sample identity
            seen.append((shard, batch["gt"].astype(np.float64).sum(axis=(1, 2))))
        it.close()
    vals0 = np.concatenate([v for s, v in seen if s == 0])
    vals1 = np.concatenate([v for s, v in seen if s == 1])
    assert len(vals0) == len(vals1) == 8
    assert not set(np.round(vals0, 6)) & set(np.round(vals1, 6))
