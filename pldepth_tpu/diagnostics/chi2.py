"""Chi^2 sampling-informativeness diagnostic.

Rebuild of pldepth/chi2compare.py:27-165: measure how close each sampling
strategy's ranking lists come to an ideal uniform depth spread. For each
trial, sample `batches_per_trial` batches, score every list with

    chi2 = sum((gt_depths - linspace(0.001, 0.999, K+1)[1:])^2 / expected)

(reference compute_chi_sq, chi2compare.py:27-37), average per batch, then
report mean/variance across trials. Sampling runs on device in batched
calls instead of the tf.numpy_function pipeline.
"""

from __future__ import annotations

from typing import Dict

import jax
import numpy as np

from pldepth_tpu.core.config import ExperimentConfig, sampler_name_for_type
from pldepth_tpu.data import BatchIterator, get_dataset
from pldepth_tpu.sampling import sample_rankings_batch


def compute_chi_sq(rankings: np.ndarray, ranking_size: int) -> float:
    """rankings: (N, K, 2) -> mean chi^2 against the fixed ideal spread."""
    expected = np.linspace(0.001, 0.999, ranking_size + 1)[1:]
    gts = rankings[..., 1]
    return float((np.square(gts - expected) / expected).sum(axis=-1).mean())


def run_chi2_compare(
    cfg: ExperimentConfig, trials: int = 5, batches_per_trial: int = 25
) -> Dict[str, float]:
    sampler = sampler_name_for_type(cfg.sampling_type)
    if cfg.dataset.lower() in ("hr-wsi", "hr_wsi", "hrwsi"):
        ds = get_dataset("HR-WSI", root=cfg.data_root, split="train",
                         size=cfg.ds_size or 1000, target_size=cfg.input_size)
    else:
        ds = get_dataset("synthetic", size=cfg.ds_size or 64,
                         target_size=cfg.input_size, seed=cfg.seed)

    scores = []
    for trial in range(trials):
        it = BatchIterator(ds, cfg.batch_size, seed=cfg.seed + trial)
        batch_scores = []
        for b in range(batches_per_trial):
            batch = next(it)
            r = np.asarray(
                sample_rankings_batch(
                    jax.random.fold_in(jax.random.key(cfg.seed + trial), b),
                    batch["gt"],
                    batch["mask"],
                    sampler_name=sampler,
                    rankings_per_image=cfg.rankings_per_image,
                    ranking_size=cfg.ranking_size,
                    threshold=cfg.equality_threshold,
                )
            )
            batch_scores.append(
                compute_chi_sq(r.reshape(-1, cfg.ranking_size, 2), cfg.ranking_size)
            )
        it.close()
        scores.append(float(np.mean(batch_scores)))
    return {
        "sampler": sampler,
        "mean": float(np.mean(scores)),
        "variance": float(np.var(scores)),
        "trials": scores,
    }
