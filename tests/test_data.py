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


def test_batch_iterator_uint8_wire():
    """uint8_wire: same stream, images/masks as u8 (4x less transfer; the
    train step rescales on device), gt untouched f32 — identical wire
    contract to the native packed reader."""
    ds = SyntheticDepthDataset(n=8, image_size=32)
    f32 = next(BatchIterator(ds, 4, seed=0, loop=False, shuffle=False))
    u8 = next(BatchIterator(ds, 4, seed=0, loop=False, shuffle=False,
                            uint8_wire=True))
    assert u8["image"].dtype == np.uint8
    assert u8["mask"].dtype == np.uint8
    assert u8["gt"].dtype == np.float32
    np.testing.assert_array_equal(u8["gt"], f32["gt"])
    # u8 is the rounded 255-scale of the float image
    np.testing.assert_array_equal(
        u8["image"],
        np.clip(f32["image"] * 255.0 + 0.5, 0, 255).astype(np.uint8),
    )
    np.testing.assert_array_equal(u8["mask"], (f32["mask"] > 0))


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


def test_batch_iterator_finite_stream_stays_exhausted():
    """After a loop=False stream ends, further next() raises StopIteration
    instead of blocking on the drained queue forever."""
    ds = SyntheticDepthDataset(n=8, image_size=16, seed=0)
    it = BatchIterator(ds, 4, seed=0, loop=False)
    batches = list(it)
    assert len(batches) == 2
    with pytest.raises(StopIteration):
        next(it)
    with pytest.raises(StopIteration):  # and again
        next(it)
    it.close()


def test_batch_iterator_close_unblocks_producer():
    """close() must release a producer blocked on the full prefetch queue
    (it used to only set a flag the blocked put() never observed)."""
    ds = SyntheticDepthDataset(n=32, image_size=16, seed=0)
    it = BatchIterator(ds, 4, seed=0, prefetch=1)
    next(it)  # ensure the producer is running and the queue fills
    it.close()
    it._thread.join(timeout=5.0)
    assert not it._thread.is_alive()


def test_multihost_shards_have_equal_batch_counts():
    """Uneven len(ds)/num_shards: hosts must still agree on batches per
    epoch or their epoch permutations desynchronize."""
    ds = SyntheticDepthDataset(n=11, image_size=16, seed=0)
    its = [
        BatchIterator(ds, 2, seed=7, shard_index=i, num_shards=2, prefetch=1)
        for i in range(2)
    ]
    # epoch = common_len // batch = (11//2)//2 = 2 batches on BOTH shards;
    # draw two epochs' worth and check disjointness within each global step
    for step in range(4):
        b0 = next(its[0])
        b1 = next(its[1])
        assert b0["image"].shape == b1["image"].shape
    for it in its:
        it.close()


def test_read_image_16bit_png_scaled_to_unit(tmp_path):
    """16-bit grayscale PNGs (PIL mode 'I'/'I;16') must land in [0,1]."""
    from pldepth_tpu.data.io import read_image

    arr16 = (np.linspace(0, 1, 64).reshape(8, 8) * 65535).astype(np.uint16)
    p = str(tmp_path / "g16.png")
    Image.fromarray(arr16).save(p)
    out = read_image(p, num_channels=1)
    assert out.dtype == np.float32
    assert 0.0 <= out.min() and out.max() <= 1.0
    assert out.max() > 0.9  # actually scaled by 65535, not 255
