"""Packed format + native reader: roundtrip fidelity and iterator behavior."""

import numpy as np
import pytest

from pldepth_tpu.data import SyntheticDepthDataset
from pldepth_tpu.data.packed import (
    NativePackedIterator,
    PackedDataset,
    build_native,
    pack_dataset,
)


@pytest.fixture(scope="module")
def packed(tmp_path_factory):
    ds = SyntheticDepthDataset(n=10, image_size=32, seed=7)
    path = str(tmp_path_factory.mktemp("pack") / "ds.pldpack")
    pack_dataset(ds, path)
    return ds, path


def test_roundtrip_via_memmap(packed):
    ds, path = packed
    pd = PackedDataset(path)
    assert len(pd) == len(ds)
    for i in [0, 3, 9]:
        a, b = ds[i], pd[i]
        np.testing.assert_allclose(a["image"], b["image"], atol=1 / 255 + 1e-6)
        np.testing.assert_allclose(a["gt"], b["gt"], rtol=1e-6)
        np.testing.assert_array_equal((a["mask"] > 0), (b["mask"] > 0))


def test_native_build():
    assert build_native() is not None, "g++ build of libpackio.so failed"


def test_native_iterator_batches_match_memmap(packed):
    ds, path = packed
    it = NativePackedIterator(
        path, batch_size=4, seed=0, shuffle=False, loop=False, uint8_wire=False
    )
    pd = PackedDataset(path)
    batches = list(it)
    it.close()
    assert len(batches) == 2  # drop remainder: 10 // 4
    flat = [b for batch in batches for b in batch["gt"]]
    for i, gt in enumerate(flat):
        np.testing.assert_allclose(gt, pd[i]["gt"], rtol=1e-6)
    assert batches[0]["image"].shape == (4, 32, 32, 3)
    assert batches[0]["image"].dtype == np.float32
    assert batches[0]["image"].max() <= 1.0


def test_native_iterator_uint8_wire(packed):
    ds, path = packed
    it = NativePackedIterator(
        path, batch_size=4, seed=0, shuffle=False, loop=False, uint8_wire=True
    )
    b = next(it)
    it.close()
    assert b["image"].dtype == np.uint8
    assert b["mask"].dtype == np.uint8
    assert b["gt"].dtype == np.float32
    want = np.stack([ds[i]["image"] for i in range(4)])
    np.testing.assert_allclose(
        b["image"].astype(np.float32) / 255.0, want, atol=1 / 255 + 1e-6
    )


def test_native_iterator_shuffles_and_loops(packed):
    _, path = packed
    it = NativePackedIterator(path, batch_size=4, seed=1, shuffle=True, loop=True)
    seen = [next(it)["gt"][0, 0, 0] for _ in range(6)]  # > one epoch
    it.close()
    assert len(set(np.round(seen, 6))) > 1


def test_malformed_files_rejected(packed, tmp_path):
    """Garbage, truncated, and wrong-magic files fail loudly in both the
    Python reader and the native one (packio.cpp validates magic, version,
    and that the mapped size covers n records)."""
    _, good = packed

    garbage = tmp_path / "garbage.pldpack"
    garbage.write_bytes(b"\x00" * 64)
    truncated = tmp_path / "truncated.pldpack"
    truncated.write_bytes(open(good, "rb").read()[:200])
    empty = tmp_path / "empty.pldpack"
    empty.write_bytes(b"")

    for bad in (garbage, truncated, empty):
        with pytest.raises(Exception):
            PackedDataset(str(bad))

    if build_native():
        for bad in (garbage, truncated, empty):
            with pytest.raises(Exception):
                NativePackedIterator(str(bad), batch_size=2)
        # the good file still opens after the failed attempts
        it = NativePackedIterator(good, batch_size=2)
        assert next(iter(it))["image"].shape[0] == 2


def test_pack_dataset_rejects_shape_drift(tmp_path):
    """A sample whose shape differs from sample 0 must fail loudly at pack
    time (it would silently shift every later record)."""

    class Drifting:
        def __len__(self):
            return 3

        def __getitem__(self, i):
            size = 16 if i != 2 else 20
            return {
                "image": np.zeros((size, size, 3), np.float32),
                "gt": np.zeros((size, size), np.float32),
                "mask": np.ones((size, size), np.float32),
            }

    with pytest.raises(ValueError, match="sample 2"):
        pack_dataset(Drifting(), str(tmp_path / "bad.pldpack"))


def test_native_iterator_rejects_zero_batch(packed):
    _, path = packed
    if not build_native():
        pytest.skip("native unavailable")
    with pytest.raises(ValueError, match="batch_size"):
        NativePackedIterator(path, batch_size=0)
