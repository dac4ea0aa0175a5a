"""Device-resident training data: the whole (image, gt, mask) set in HBM.

The streaming path decodes on host and feeds every step over the host→device
link — on a tunnel-attached TPU that link caps end-to-end training at a
fraction of the device step rate. But this workload's datasets *fit in HBM*
(6 bytes/pixel: a 448² image is ~1.2 MB, the reference's 10k-image HR-WSI
subset ≈ 12 GB on a 16 GB v5e chip, and the common 1k/3k subsets are far
smaller — reference subset paths at pldepth/PLDepth.py:139,
run_scripts/rnd_PLDepth.py:127). So the fastest input pipeline is none:
upload the packed dataset once, draw batch indices on device inside the
jitted step, and decode (u8→f32 /255, u16→f32 ×scale) on device. Zero
per-step host↔device traffic; the fed training rate equals the device step
rate by construction.

Storage layout (6 bytes/pixel):
  image (N, H, W, 3) uint8       — the wire format the train step already
                                   decodes on device (train/trainer.py)
  gt    (N, H, W)    uint16      — quantized by ``gt_scale`` (float gt =
                                   u16 × gt_scale); 16-bit PNG ground truth
                                   (HR-WSI gts/*.png) round-trips exactly,
                                   other sources quantize to ≤1.6e-5 of the
                                   per-dataset max — far inside the 3%
                                   equality ratio test of the samplers
                                   (reference depth_utils.py:5-21)
  mask  (N, H, W)    uint8       — validity mask

Sharding: samples are sharded over the mesh "data" axis (each device holds
N/D samples and draws its per-shard slice of the global batch from them —
the device-side analogue of multi-host shard-local shuffling); under spatial
partitioning rows are additionally sharded over the "model" axis. Batch
composition is per-step uniform draws *with replacement* from the local
shard — the device-side analogue of the reference's shuffle(1024)+repeat
stream (hourglass_provider.py:60-62), which was also not a true epoch
permutation. Use the streaming BatchIterator when exact epoch-permutation
order matters (e.g. bitwise resume parity).
"""

from __future__ import annotations

import dataclasses
import logging
from typing import Dict, Optional

import jax
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from pldepth_tpu.data.datasets import DepthDataset

log = logging.getLogger(__name__)

BYTES_PER_PIXEL = 6  # u8 rgb (3) + u16 gt (2) + u8 mask (1)


def estimate_store_bytes(n: int, image_size: int) -> int:
    return n * image_size * image_size * BYTES_PER_PIXEL


@dataclasses.dataclass
class ResidentStore:
    """Device arrays + metadata for in-HBM training data.

    ``arrays`` holds image/gt/mask as described in the module docstring plus
    ``gt_scale`` — a replicated f32 scalar so the jitted step can dequantize
    without a static closure (stores with different scales share one
    compiled step).
    """

    arrays: Dict[str, jax.Array]
    n: int  # global sample count actually resident (truncated for sharding)
    gt_scale: float

    @property
    def nbytes(self) -> int:
        return sum(int(a.size) * a.dtype.itemsize for a in self.arrays.values())


def build_resident_store(
    ds: DepthDataset,
    mesh,
    *,
    spatial_axis: Optional[str] = None,
    max_bytes: Optional[int] = None,
    shard_index: int = 0,
    num_shards: int = 1,
) -> ResidentStore:
    """Load ``ds`` on host, quantize, and upload sharded over ``mesh``.

    Multi-host (``num_shards > 1``): each process loads only its stride of
    the sample indices and contributes it as process-local data, mirroring
    BatchIterator's sharding; ``shard_index``/``num_shards`` must match the
    jax.distributed process layout.

    The global sample count is truncated to a multiple of
    (data-axis size × num_shards) so every device holds an equally-sized
    shard (fixed shapes; the resident analogue of drop_remainder).
    """
    d = mesh.axis_names[0]
    dsize = mesh.shape[d]
    chunk = dsize * num_shards
    n = (len(ds) // chunk) * chunk
    if n == 0:
        raise ValueError(
            f"dataset of {len(ds)} samples cannot shard over "
            f"{dsize} devices x {num_shards} hosts"
        )
    if n != len(ds):
        log.info("resident store: truncating %d -> %d samples for even "
                 "sharding", len(ds), n)

    probe = ds[0]
    h, w = probe["gt"].shape
    if max_bytes is not None and n * h * w * BYTES_PER_PIXEL > max_bytes:
        raise ValueError(
            f"resident store would need {n * h * w * BYTES_PER_PIXEL / 1e9:.1f} GB "
            f"> max_bytes {max_bytes / 1e9:.1f} GB — use the streaming pipeline"
        )

    local_idx = list(range(n))[shard_index::num_shards]
    images = np.empty((len(local_idx), h, w, 3), np.uint8)
    gts = np.empty((len(local_idx), h, w), np.float32)
    masks = np.empty((len(local_idx), h, w), np.uint8)
    for row, i in enumerate(local_idx):
        s = ds[i]
        img = s["image"]
        if img.dtype != np.uint8:  # [0,1] float -> u8 wire format
            img = np.clip(np.round(img * 255.0), 0, 255).astype(np.uint8)
        images[row] = img
        gts[row] = s["gt"]
        masks[row] = (s["mask"] > 0).astype(np.uint8)

    # global quantization scale: all hosts must agree; derive from the local
    # max and reduce across processes when distributed
    gt_max = float(gts.max()) if gts.size else 1.0
    if num_shards > 1:
        from jax.experimental import multihost_utils

        gt_max = float(
            multihost_utils.process_allgather(np.float32(gt_max)).max()
        )
    gt_max = max(gt_max, 1e-6)
    gt_scale = gt_max / 65535.0
    gt_q = np.clip(np.round(gts / gt_scale), 0, 65535).astype(np.uint16)

    hspec = spatial_axis  # None or the model-axis name (rows sharded)
    specs = {
        "image": P(d, hspec, None, None),
        "gt": P(d, hspec, None),
        "mask": P(d, hspec, None),
    }
    host = {"image": images, "gt": gt_q, "mask": masks}
    arrays = {}
    for k, x in host.items():
        sharding = NamedSharding(mesh, specs[k])
        if num_shards > 1:
            arrays[k] = jax.make_array_from_process_local_data(sharding, x)
        else:
            arrays[k] = jax.device_put(x, sharding)
    arrays["gt_scale"] = jax.device_put(
        np.float32(gt_scale), NamedSharding(mesh, P())
    )
    store = ResidentStore(arrays=arrays, n=n, gt_scale=gt_scale)
    log.info(
        "resident store: %d samples @ %dx%d, %.2f GB in HBM (gt_scale %.3e)",
        n, h, w, store.nbytes / 1e9, gt_scale,
    )
    return store
