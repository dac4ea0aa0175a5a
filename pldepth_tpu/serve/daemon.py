"""Directory-watching serving daemon.

Long-running serving loop: watch a directory, run every new image through
the depth forward, write ``<stem>_depth.npy`` (+ optional png preview) to
the output directory. Two model sources:

- a weights checkpoint (``Trainer.jit_predict``: data-parallel over every
  visible chip, optional fused Pallas encoder), or
- an AOT artifact from ``cli export`` (serve/export.py) — no model code
  needed at serving time; pair with a batch-polymorphic export so the
  tail batch compiles once per distinct size.

New files are picked up when their size is stable across two polls (a
half-written upload never reaches the device). Each poll's backlog is
processed through serve/pipeline.run_pipeline, so decode, device compute
and file writes overlap. The reference has no serving story at all — its
closest path is per-image ``model.predict`` inside eval scripts
(pldepth/test_data_eval.py:30-108).
"""

from __future__ import annotations

import json
import logging
import os
import time
from typing import Callable, Dict, Optional, Sequence

import numpy as np

from pldepth_tpu.serve.pipeline import run_pipeline

log = logging.getLogger(__name__)

_EXTS = (".jpg", ".jpeg", ".png")


def _scan(watch_dir: str) -> Dict[str, int]:
    out: Dict[str, int] = {}
    try:
        for name in os.listdir(watch_dir):
            if name.lower().endswith(_EXTS):
                p = os.path.join(watch_dir, name)
                try:
                    out[p] = os.stat(p).st_size
                except OSError:
                    pass  # vanished between listdir and stat
    except FileNotFoundError:
        pass
    return out


def _write_outputs(out_dir: str, save_png: bool):
    def write(chunk: Sequence[str], preds: np.ndarray) -> None:
        for f, d in zip(chunk, preds[: len(chunk)]):
            stem = os.path.splitext(os.path.basename(f))[0]
            np.save(os.path.join(out_dir, f"{stem}_depth.npy"), d)
            if save_png:
                from PIL import Image

                lo, hi = float(d.min()), float(d.max())
                u8 = ((d - lo) / max(hi - lo, 1e-9) * 255).astype(np.uint8)
                Image.fromarray(u8).save(
                    os.path.join(out_dir, f"{stem}_depth.png")
                )

    return write


def serve_directory(
    watch_dir: str,
    out_dir: str,
    infer: Callable[[np.ndarray], np.ndarray],
    input_size: int,
    batch_size: int,
    *,
    pad_batch: Optional[Callable[[np.ndarray], np.ndarray]] = None,
    save_png: bool = False,
    poll_interval: float = 0.5,
    once: bool = False,
    max_polls: Optional[int] = None,
) -> int:
    """Serve until interrupted (or one backlog pass with ``once=True``).

    ``infer`` maps a ``(batch_size, S, S, 3)`` float32 array to depth maps;
    ``pad_batch`` (optional) rounds a short tail chunk up to the dispatch
    batch. Returns the number of images processed. A file is processed when
    its size is unchanged since the previous poll and its ``_depth.npy``
    output does not exist yet.
    """
    from pldepth_tpu.data import io as dio

    os.makedirs(out_dir, exist_ok=True)
    write = _write_outputs(out_dir, save_png)

    def decode(chunk: Sequence[str]) -> np.ndarray:
        imgs = np.stack([
            dio.resize_bilinear(dio.read_image(f, 3), (input_size, input_size))
            for f in chunk
        ])
        if pad_batch is not None:
            imgs = pad_batch(imgs)
        return imgs

    def done_path(f: str) -> str:
        stem = os.path.splitext(os.path.basename(f))[0]
        return os.path.join(out_dir, f"{stem}_depth.npy")

    processed = 0
    prev_sizes: Dict[str, int] = {} if not once else _scan(watch_dir)
    polls = 0
    while True:
        sizes = _scan(watch_dir)
        ready = sorted(
            f for f, sz in sizes.items()
            if prev_sizes.get(f) == sz and not os.path.exists(done_path(f))
        )
        prev_sizes = sizes
        if ready:
            chunks = [
                ready[s : s + batch_size]
                for s in range(0, len(ready), batch_size)
            ]
            n = run_pipeline(chunks, decode, infer, write)
            processed += sum(len(c) for c in chunks)
            log.info("served %d images (%d batches)", processed, n)
        polls += 1
        if once:
            return processed
        if max_polls is not None and polls >= max_polls:
            return processed
        time.sleep(poll_interval)


def artifact_infer(path: str) -> tuple[Callable[[np.ndarray], np.ndarray], dict]:
    """Inference callable from an exported artifact (weights baked in)."""
    from pldepth_tpu.serve.export import load_exported

    call, meta = load_exported(path)

    def infer(imgs: np.ndarray):
        return call(np.asarray(imgs, np.float32))

    return infer, meta
