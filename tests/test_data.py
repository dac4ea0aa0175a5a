"""Data layer: dataset registry, HR-WSI directory layout, pipeline, resize."""

import os

import numpy as np
import pytest
from PIL import Image

from pldepth_tpu.data import (
    BatchIterator,
    SyntheticDepthDataset,
    get_dataset,
    pregenerate_val_rankings,
    train_val_split,
)
from pldepth_tpu.data.datasets import load_hrwsi


def _write_hrwsi_tree(root, n=4, size=32):
    rng = np.random.default_rng(0)
    for sub in ("imgs", "gts", "valid_masks"):
        os.makedirs(os.path.join(root, "train", sub), exist_ok=True)
    for i in range(n):
        img = (rng.uniform(0, 255, (size, size, 3))).astype(np.uint8)
        gt = (rng.uniform(0, 255, (size, size))).astype(np.uint8)
        mask = (rng.uniform(size=(size, size)) > 0.3).astype(np.uint8) * 255
        Image.fromarray(img).save(os.path.join(root, "train/imgs", f"{i:03d}.jpg"))
        Image.fromarray(gt).save(os.path.join(root, "train/gts", f"{i:03d}.png"))
        Image.fromarray(mask).save(
            os.path.join(root, "train/valid_masks", f"{i:03d}.png")
        )


def test_hrwsi_layout_and_shapes(tmp_path):
    _write_hrwsi_tree(tmp_path, n=4, size=48)
    ds = load_hrwsi(str(tmp_path), "train", target_size=32)
    assert len(ds) == 4
    s = ds[0]
    assert s["image"].shape == (32, 32, 3)
    assert s["gt"].shape == (32, 32)
    assert s["mask"].shape == (32, 32)
    assert 0.0 <= s["image"].min() and s["image"].max() <= 1.0
    assert set(np.unique(s["mask"])) <= {0.0, 1.0}


def test_dataset_name_lookup():
    ds = get_dataset("synthetic", size=4, target_size=32)
    assert len(ds) == 4
    with pytest.raises(ValueError):
        get_dataset("nope")


def test_train_val_split_reference_semantics():
    ds = SyntheticDepthDataset(n=30, image_size=32)
    train, val = train_val_split(ds, denom=15)
    assert len(val) == 2 and len(train) == 28
    # val is the head, train the tail (reference take/skip, PLDepth.py:142-147)
    np.testing.assert_array_equal(val[0]["gt"], ds[0]["gt"])
    np.testing.assert_array_equal(train[0]["gt"], ds[2]["gt"])


def test_batch_iterator_shapes_and_epochs():
    ds = SyntheticDepthDataset(n=10, image_size=32)
    it = BatchIterator(ds, batch_size=4, seed=0, loop=False, shuffle=True)
    batches = list(it)
    assert len(batches) == 2  # drop_remainder
    assert batches[0]["image"].shape == (4, 32, 32, 3)


def test_pregenerate_val_rankings_deterministic():
    ds = SyntheticDepthDataset(n=6, image_size=32)
    r1 = pregenerate_val_rankings(
        ds, sampler_name="thresholded", rankings_per_image=8, ranking_size=3, seed=1
    )
    r2 = pregenerate_val_rankings(
        ds, sampler_name="thresholded", rankings_per_image=8, ranking_size=3, seed=1
    )
    assert r1.shape == (6, 8, 3, 2)
    np.testing.assert_array_equal(r1, r2)
