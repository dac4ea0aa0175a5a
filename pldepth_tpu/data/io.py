"""Host-side decode of the reference's on-disk formats.

One decode per file, producing fixed-shape float32 arrays; everything after
(augment, sample, normalize) happens on device. Decoders cover the formats
of the reference DAOs: jpg/png (HR-WSI, Sintel — data_meta.py:37-43), .npy
depth (DIODE — diode.py:35), .mat (Ibims — ibims.py:19) and .h5 (TUM —
tum.py:27).

Host resizing uses cv2 bilinear/nearest, which shares TF's half-pixel
sampling convention (the reference resizes with tf.image.resize,
hr_wsi.py:65-78).
"""

from __future__ import annotations

from typing import Sequence, Tuple

import numpy as np

try:  # cv2 is present in this image; PIL fallback kept for portability
    import cv2

    _HAS_CV2 = True
except Exception:  # pragma: no cover
    _HAS_CV2 = False

from PIL import Image


def read_image(path: str, num_channels: int = 3) -> np.ndarray:
    """Decode jpg/png to float32 [0,1], shape (H, W, C)."""
    img = Image.open(path)
    if num_channels == 3:
        img = img.convert("RGB")
    elif num_channels == 1 and img.mode not in ("L", "I", "I;16"):
        img = img.convert("L")
    arr = np.asarray(img)
    if arr.ndim == 2:
        arr = arr[..., None]
    if arr.dtype == np.uint16 or img.mode in ("I", "I;16"):
        # PIL decodes 16-bit grayscale PNGs as mode "I" (int32 array);
        # dividing those by 255 would return values up to ~257
        return arr.astype(np.float32) / 65535.0
    return arr.astype(np.float32) / 255.0


def resize_bilinear(arr: np.ndarray, size: Sequence[int]) -> np.ndarray:
    """(H, W[, C]) -> (size[0], size[1][, C]), TF-convention bilinear."""
    h, w = int(size[0]), int(size[1])
    if _HAS_CV2:
        out = cv2.resize(arr, (w, h), interpolation=cv2.INTER_LINEAR)
    else:  # pragma: no cover
        import jax

        out = np.asarray(
            jax.image.resize(arr, (h, w) + arr.shape[2:], "bilinear", antialias=False)
        )
    if arr.ndim == 3 and out.ndim == 2:
        out = out[..., None]
    return out.astype(np.float32)


def resize_nearest(arr: np.ndarray, size: Sequence[int]) -> np.ndarray:
    h, w = int(size[0]), int(size[1])
    if _HAS_CV2:
        out = cv2.resize(arr, (w, h), interpolation=cv2.INTER_NEAREST)
    else:  # pragma: no cover
        step0 = arr.shape[0] / h
        step1 = arr.shape[1] / w
        idx0 = np.minimum((np.arange(h) * step0).astype(int), arr.shape[0] - 1)
        idx1 = np.minimum((np.arange(w) * step1).astype(int), arr.shape[1] - 1)
        out = arr[np.ix_(idx0, idx1)]
    return out.astype(np.float32)


def read_npy_depth(path: str) -> np.ndarray:
    return np.squeeze(np.load(path)).astype(np.float32)


def read_mat_ibims(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """Ibims .mat: data struct with image at field 2, depth at field 3
    (reference ibims.py:19-22)."""
    from scipy import io as sio

    raw = sio.loadmat(path)["data"]
    image = np.asarray(raw[0][0][2], np.float32)
    gt = np.asarray(raw[0][0][3], np.float32)
    if image.max() > 1.5:
        image = image / 255.0
    return image, gt


def read_h5_tum(path: str) -> Tuple[np.ndarray, np.ndarray]:
    """TUM .h5: gt/img_1 image + gt/pp_depth pseudo-depth
    (reference tum.py:27-31)."""
    import h5py

    with h5py.File(path, "r") as f:
        image = np.asarray(f["gt"]["img_1"], np.float32)
        gt = np.asarray(f["gt"]["pp_depth"], np.float32)
    if image.max() > 1.5:
        image = image / 255.0
    return image, gt
