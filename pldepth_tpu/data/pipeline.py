"""Host batch pipeline: shuffle, batch, background prefetch.

Replaces the reference's ``tf.data`` provider plumbing
(pldepth/data/providers/hourglass_provider.py:29-73). The division of labor
is different by design: the host only decodes and batches raw
(image, gt, mask) arrays; augmentation and ranking sampling moved inside the
jitted train step (see train/trainer.py). Validation rankings are still
pre-generated once so the val loss is comparable across epochs (reference
behavior, hourglass_provider.py:64-73) — but with the *device* sampler in one
batched call instead of a tqdm Python loop per image
(hourglass_provider.py:183-193).
"""

from __future__ import annotations

import queue
import threading
from typing import Dict, Iterator, List, Tuple

import jax
import numpy as np

from pldepth_tpu.data.datasets import DepthDataset
from pldepth_tpu.sampling import sample_rankings_batch


def train_val_split(ds: DepthDataset, denom: int = 15) -> Tuple[DepthDataset, DepthDataset]:
    """Reference split: first ds_size//denom samples are validation
    (pldepth/PLDepth.py:142-147)."""
    n_val = len(ds) // denom
    return ds.skip(n_val), ds.take(n_val)


def _stack(samples: List[Dict[str, np.ndarray]]) -> Dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


class BatchIterator:
    """Infinite shuffled batch iterator with a background prefetch thread.

    drop_remainder semantics like the reference's ``.batch(batch_size,
    drop_remainder=True)`` (hourglass_provider.py:60-62): fixed shapes only.

    The batch stream is a pure function of (dataset, seed, shuffle, shard,
    batch_size): epoch ``e``'s permutation is drawn from a fresh
    ``default_rng((seed, e))``, so ``start_step=k`` resumes the exact stream
    at batch ``k`` without replaying decodes — the basis of deterministic
    checkpoint/resume (train/trainer.py fit; the reference had no resumable
    input pipeline, SURVEY.md §5).
    """

    def __init__(
        self,
        ds: DepthDataset,
        batch_size: int,
        seed: int = 0,
        shuffle: bool = True,
        prefetch: int = 2,
        loop: bool = True,
        shard_index: int = 0,
        num_shards: int = 1,
        start_step: int = 0,
        uint8_wire: bool = False,
    ):
        """``shard_index``/``num_shards``: multi-host data sharding — each
        host draws the same seeded epoch permutation and takes a disjoint
        stride of it, so per-host batches form one coherent global batch
        (process i feeds its addressable devices under jax.distributed).
        ``start_step``: skip the first N batches of the stream (resume).
        ``uint8_wire``: emit images/masks as uint8 (gt stays f32 — depth
        supervision must not be quantized), 4x less host→device transfer;
        the train step rescales on device (trainer.py). Off by default:
        it quantizes image values to 1/255 steps, which is exact for
        8-bit-source data (jpg/png) but changes synthetic float images —
        the golden/parity tests feed f32. Same wire contract as the
        native packed reader (data/packed.py uint8_wire)."""
        if len(ds) < batch_size * num_shards:
            raise ValueError(
                f"dataset of {len(ds)} samples cannot fill batch "
                f"{batch_size} x {num_shards} hosts"
            )
        self.ds = ds
        self.batch_size = batch_size
        self.seed = seed
        self.shuffle = shuffle
        self.loop = loop
        self.shard_index = shard_index
        self.num_shards = num_shards
        self.start_step = start_step
        self.uint8_wire = uint8_wire
        self._q: "queue.Queue" = queue.Queue(maxsize=max(1, prefetch))
        self._thread = threading.Thread(target=self._producer, daemon=True)
        self._stopped = False
        self._done = False
        self._thread.start()

    def _index_stream(self):
        epoch = 0
        skip = self.start_step
        while True:
            idx = np.arange(len(self.ds))
            if self.shuffle:
                np.random.default_rng((self.seed, epoch)).shuffle(idx)
            if self.num_shards > 1:
                # truncate to the COMMON per-shard length: when len(ds) is
                # not divisible by num_shards a stride slice gives hosts
                # different batch counts per epoch, silently desynchronizing
                # their epoch permutations from the first uneven epoch on
                common = len(idx) // self.num_shards
                idx = idx[self.shard_index :: self.num_shards][:common]
            n_batches = len(idx) // self.batch_size
            if skip >= n_batches:
                skip -= n_batches
            else:
                for b in range(skip, n_batches):
                    yield idx[b * self.batch_size : (b + 1) * self.batch_size]
                skip = 0
            if not self.loop:
                return
            epoch += 1

    def _put(self, item) -> bool:
        """Bounded put that keeps observing the stop flag: a producer
        blocked in a plain Queue.put() (the steady state — queue full)
        would never see close() and leak the thread + prefetched batches."""
        while not self._stopped:
            try:
                self._q.put(item, timeout=0.2)
                return True
            except queue.Full:
                continue
        return False

    def _to_wire(self, batch):
        if not self.uint8_wire:
            return batch
        batch["image"] = np.clip(
            batch["image"] * 255.0 + 0.5, 0, 255
        ).astype(np.uint8)
        if "mask" in batch:
            batch["mask"] = (batch["mask"] > 0).astype(np.uint8)
        return batch

    def _producer(self):
        try:
            for batch_idx in self._index_stream():
                if self._stopped:
                    return
                batch = self._to_wire(_stack([self.ds[int(i)] for i in batch_idx]))
                if not self._put(batch):
                    return
            self._put(None)
        except Exception as e:  # pragma: no cover
            self._put(e)

    def __iter__(self):
        return self

    def __next__(self) -> Dict[str, np.ndarray]:
        if self._done:
            raise StopIteration  # stay exhausted: the sentinel was consumed
        item = self._q.get()
        if item is None:
            self._done = True
            raise StopIteration
        if isinstance(item, Exception):
            self._done = True
            raise item
        return item

    def close(self):
        self._stopped = True
        # unblock a producer waiting on a full queue and drop its batches
        try:
            while True:
                self._q.get_nowait()
        except queue.Empty:
            pass
        self._thread.join(timeout=5.0)


def pregenerate_val_rankings(
    ds: DepthDataset,
    *,
    sampler_name: str,
    rankings_per_image: int,
    ranking_size: int,
    threshold: float = 0.03,
    seed: int = 0,
    chunk: int = 16,
) -> np.ndarray:
    """(N, RPI, K, 2) fixed validation rankings, generated on device.

    The reference used the thresholded sampler for validation regardless of
    the training strategy (hourglass_provider.py:22); callers preserve that
    by passing sampler_name="thresholded".
    """
    out = []
    key = jax.random.key(seed)
    for start in range(0, len(ds), chunk):
        items = [ds[i] for i in range(start, min(start + chunk, len(ds)))]
        gts = np.stack([s["gt"] for s in items])
        masks = np.stack([s["mask"] for s in items])
        r = sample_rankings_batch(
            jax.random.fold_in(key, start),
            gts,
            masks,
            sampler_name=sampler_name,
            rankings_per_image=rankings_per_image,
            ranking_size=ranking_size,
            threshold=threshold,
        )
        out.append(np.asarray(r))
    return np.concatenate(out, axis=0)


def val_batches(
    ds: DepthDataset, rankings: np.ndarray, batch_size: int
) -> Iterator[Dict[str, np.ndarray]]:
    """Fixed-order validation batches carrying pre-generated rankings."""
    n_batches = len(ds) // batch_size
    for b in range(n_batches):
        items = [ds[i] for i in range(b * batch_size, (b + 1) * batch_size)]
        yield {
            "image": np.stack([s["image"] for s in items]),
            "rankings": rankings[b * batch_size : (b + 1) * batch_size],
        }
