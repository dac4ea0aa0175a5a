"""Offline dump of sampled (image, rankings) training data.

Rebuild of the reference offline dump (pldepth/active_learning/
offline_data.py:16-127: subclassed provider + script writing jpg + npy per
sample). Here one function samples rankings for a whole dataset with the
device sampler and writes either per-sample files (jpg + npy, reference
layout) or a single packed archive for fast reload.
"""

from __future__ import annotations

import json
import logging
import os

import jax
import numpy as np

from pldepth_tpu.data.datasets import DepthDataset
from pldepth_tpu.sampling import sample_rankings_batch

log = logging.getLogger(__name__)


def dump_offline_data(
    ds: DepthDataset,
    out_dir: str,
    *,
    sampler_name: str = "info_score",
    rankings_per_image: int = 100,
    ranking_size: int = 5,
    threshold: float = 0.03,
    seed: int = 0,
    chunk: int = 16,
    image_format: str = "jpg",  # "jpg" per-sample files | "npz" single archive
) -> str:
    os.makedirs(out_dir, exist_ok=True)
    key = jax.random.key(seed)
    all_rankings = []
    for start in range(0, len(ds), chunk):
        items = [ds[i] for i in range(start, min(start + chunk, len(ds)))]
        gts = np.stack([s["gt"] for s in items])
        masks = np.stack([s["mask"] for s in items])
        r = np.asarray(
            sample_rankings_batch(
                jax.random.fold_in(key, start), gts, masks,
                sampler_name=sampler_name,
                rankings_per_image=rankings_per_image,
                ranking_size=ranking_size,
                threshold=threshold,
            )
        )
        if image_format == "jpg":
            from PIL import Image

            for j, s in enumerate(items):
                idx = start + j
                Image.fromarray(
                    (np.clip(s["image"], 0, 1) * 255).astype(np.uint8)
                ).save(os.path.join(out_dir, f"{idx:06d}.jpg"), quality=95)
                np.save(os.path.join(out_dir, f"{idx:06d}_rankings.npy"), r[j])
        all_rankings.append(r)

    rankings = np.concatenate(all_rankings, axis=0)
    if image_format == "npz":
        images = np.stack(
            [(np.clip(ds[i]["image"], 0, 1) * 255).astype(np.uint8) for i in range(len(ds))]
        )
        np.savez_compressed(
            os.path.join(out_dir, "offline_data.npz"),
            images=images, rankings=rankings,
        )
    with open(os.path.join(out_dir, "meta.json"), "w") as f:
        json.dump(
            {
                "n": len(ds), "sampler": sampler_name,
                "rankings_per_image": rankings_per_image,
                "ranking_size": ranking_size, "threshold": threshold, "seed": seed,
            },
            f, indent=2,
        )
    log.info("dumped %d samples to %s", len(ds), out_dir)
    return out_dir


def load_offline_rankings(out_dir: str) -> np.ndarray:
    """Load the ranking arrays written by :func:`dump_offline_data`."""
    npz = os.path.join(out_dir, "offline_data.npz")
    if os.path.exists(npz):
        return np.load(npz)["rankings"]
    files = sorted(
        f for f in os.listdir(out_dir) if f.endswith("_rankings.npy")
    )
    return np.stack([np.load(os.path.join(out_dir, f)) for f in files])
