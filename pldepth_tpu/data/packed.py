"""Packed-dataset format + native reader bindings.

Decode-once data path: any :class:`DepthDataset` is packed into one binary
file (u8 images, f32 gt, u8 mask — see native/packio.cpp for the layout),
then training streams batches through the C++ mmap reader with a background
prefetch ring. This replaces the reference's per-sample Python decode inside
``tf.data`` (the host-side bottleneck, SURVEY.md §3.1) with a zero-Python
steady-state loop: the only per-step host work is handing a filled buffer to
``jax.device_put``.

The shared library builds on first use (g++ -O3 -shared); the pure-Python
``PackedDataset`` fallback reads the same file via numpy memmap when no
compiler is available.
"""

from __future__ import annotations

import ctypes
import logging
import os
import struct
import subprocess
from typing import Dict, Optional

import numpy as np

from pldepth_tpu.data.datasets import DepthDataset

log = logging.getLogger(__name__)

_MAGIC = b"PLDPACK1"
_HEADER = struct.Struct("<8sIIII")  # magic, version, n, h, w

_NATIVE_DIR = os.path.join(os.path.dirname(__file__), "..", "..", "native")
_LIB = None


def _lib_path() -> str:
    return os.path.abspath(os.path.join(_NATIVE_DIR, "build", "libpackio.so"))


def build_native(force: bool = False) -> Optional[str]:
    path = _lib_path()
    src = os.path.abspath(os.path.join(_NATIVE_DIR, "packio.cpp"))
    if os.path.exists(path) and not force:
        if os.path.getmtime(path) >= os.path.getmtime(src):
            return path
    try:
        subprocess.run(
            ["make", "-C", os.path.abspath(_NATIVE_DIR)],
            check=True, capture_output=True, text=True,
        )
        return path
    except Exception as e:  # pragma: no cover
        log.warning("native packio build failed (%s); using numpy fallback", e)
        return None


def _load_lib():
    global _LIB
    if _LIB is not None:
        return _LIB
    path = build_native()
    if path is None or not os.path.exists(path):
        return None
    lib = ctypes.CDLL(path)
    lib.packio_open.restype = ctypes.c_void_p
    lib.packio_open.argtypes = [ctypes.c_char_p]
    lib.packio_close.argtypes = [ctypes.c_void_p]
    lib.packio_info.argtypes = [ctypes.c_void_p] + [
        ctypes.POINTER(ctypes.c_uint32)
    ] * 3
    lib.packio_get_batch.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint32),
        ctypes.c_uint32,
        ctypes.c_int,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.packio_prefetch_start.restype = ctypes.c_void_p
    lib.packio_prefetch_start.argtypes = [
        ctypes.c_void_p, ctypes.c_uint32, ctypes.c_uint64,
        ctypes.c_int, ctypes.c_int, ctypes.c_int, ctypes.c_uint32, ctypes.c_int,
        ctypes.c_uint64,
    ]
    lib.packio_prefetch_next.restype = ctypes.c_int
    lib.packio_prefetch_next.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_float),
    ]
    lib.packio_prefetch_next_u8.restype = ctypes.c_int
    lib.packio_prefetch_next_u8.argtypes = [
        ctypes.c_void_p,
        ctypes.POINTER(ctypes.c_uint8),
        ctypes.POINTER(ctypes.c_float),
        ctypes.POINTER(ctypes.c_uint8),
    ]
    lib.packio_prefetch_stop.argtypes = [ctypes.c_void_p]
    _LIB = lib
    return lib


# ---------------------------------------------------------------------------
# writer
# ---------------------------------------------------------------------------


def pack_dataset(ds: DepthDataset, path: str) -> str:
    """Write a DepthDataset into the packed format (decode-once)."""
    s0 = ds[0]
    h, w = s0["gt"].shape
    with open(path, "wb") as f:
        f.write(_HEADER.pack(_MAGIC, 1, len(ds), h, w))
        for i in range(len(ds)):
            s = ds[i]
            # records are fixed-size; one deviant sample would silently
            # shift every later record (the reader's size check still
            # passes when the file ends up LONGER than expected)
            if s["gt"].shape != (h, w) or s["image"].shape != (h, w, 3):
                raise ValueError(
                    f"sample {i} has shape gt={s['gt'].shape} "
                    f"image={s['image'].shape}; expected ({h}, {w}) from "
                    f"sample 0 — resize the dataset before packing"
                )
            img = np.clip(s["image"] * 255.0 + 0.5, 0, 255).astype(np.uint8)
            f.write(img.tobytes())
            f.write(s["gt"].astype("<f4").tobytes())
            f.write((s["mask"] > 0).astype(np.uint8).tobytes())
    return path


# ---------------------------------------------------------------------------
# readers
# ---------------------------------------------------------------------------


class PackedDataset(DepthDataset):
    """DepthDataset view over a packed file (numpy memmap, zero decode)."""

    def __init__(self, path: str):
        with open(path, "rb") as f:
            magic, version, n, h, w = _HEADER.unpack(f.read(_HEADER.size))
        if magic != _MAGIC or version != 1:
            raise ValueError(f"{path} is not a PLDPACK1 file")
        hw = h * w
        rec = hw * 3 + hw * 4 + hw
        raw = np.memmap(path, dtype=np.uint8, mode="r", offset=_HEADER.size)
        raw = raw[: n * rec].reshape(n, rec)
        self._h, self._w = h, w
        self._raw = raw

        def load(i: int) -> Dict[str, np.ndarray]:
            r = self._raw[i]
            img = r[: hw * 3].reshape(h, w, 3).astype(np.float32) / 255.0
            gt = r[hw * 3 : hw * 3 + hw * 4].view("<f4").reshape(h, w).copy()
            mask = r[hw * 3 + hw * 4 :].reshape(h, w).astype(np.float32)
            return {"image": img, "gt": gt, "mask": mask}

        super().__init__(name="packed", size=n, loader=load)


class NativePackedIterator:
    """Infinite shuffled batch iterator backed by the C++ prefetch ring.

    Drop-in for data/pipeline.BatchIterator on packed files.
    """

    def __init__(
        self,
        path: str,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        loop: bool = True,
        workers: Optional[int] = None,
        ring: int = 2,
        uint8_wire: bool = True,
        start_step: int = 0,
    ):
        """``uint8_wire``: emit images/masks as uint8 (gt stays f32). 4x less
        host->device transfer; the Trainer rescales on device.
        ``start_step``: skip the first N batches of the deterministic stream
        (resume; skipped batches are never decoded)."""
        if workers is None:
            workers = max(1, (os.cpu_count() or 1) - 1)
        self.uint8_wire = uint8_wire
        lib = _load_lib()
        if lib is None:
            raise RuntimeError("native packio unavailable; use PackedDataset")
        self._lib = lib
        self._h_reader = lib.packio_open(path.encode())
        if not self._h_reader:
            raise FileNotFoundError(f"cannot open packed file {path}")
        n = ctypes.c_uint32()
        h = ctypes.c_uint32()
        w = ctypes.c_uint32()
        lib.packio_info(
            self._h_reader, ctypes.byref(n), ctypes.byref(h), ctypes.byref(w)
        )
        self.n, self.h, self.w = n.value, h.value, w.value
        if batch_size < 1:
            raise ValueError(f"batch_size must be >= 1, got {batch_size}")
        if self.n < batch_size:
            raise ValueError(f"{self.n} records cannot fill batch {batch_size}")
        self.batch_size = batch_size
        self._pf = lib.packio_prefetch_start(
            self._h_reader, batch_size, seed, int(shuffle), int(loop), workers,
            ring, int(uint8_wire), int(start_step),
        )

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        # fresh arrays per batch: the C++ side fills them directly (single
        # copy out of the ring), ownership passes to the caller
        gt = np.empty((self.batch_size, self.h, self.w), np.float32)
        if self.uint8_wire:
            img = np.empty((self.batch_size, self.h, self.w, 3), np.uint8)
            mask = np.empty((self.batch_size, self.h, self.w), np.uint8)
            ok = self._lib.packio_prefetch_next_u8(
                self._pf,
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
                gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
            )
        else:
            img = np.empty((self.batch_size, self.h, self.w, 3), np.float32)
            mask = np.empty((self.batch_size, self.h, self.w), np.float32)
            ok = self._lib.packio_prefetch_next(
                self._pf,
                img.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                gt.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
                mask.ctypes.data_as(ctypes.POINTER(ctypes.c_float)),
            )
        if not ok:
            raise StopIteration
        return {"image": img, "gt": gt, "mask": mask}

    def close(self):
        if getattr(self, "_pf", None):
            self._lib.packio_prefetch_stop(self._pf)
            self._pf = None
        if getattr(self, "_h_reader", None):
            self._lib.packio_close(self._h_reader)
            self._h_reader = None

    def __del__(self):  # pragma: no cover
        try:
            self.close()
        except Exception:
            pass
