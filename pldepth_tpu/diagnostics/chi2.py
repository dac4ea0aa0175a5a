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


def ranking_stats(rankings: np.ndarray, threshold: float = 0.03) -> Dict[str, float]:
    """Distributional summary of a set of ranking lists.

    Used by the sampler distributional-parity protocol
    (tools/sampler_parity_check.py / tests/test_sampler_parity.py): the same
    statistics are computed over lists drawn by the reference numpy samplers
    (pldepth/data/sampling.py:100-243) and by the on-device samplers on
    identical (gt, mask) inputs, following the chi2compare.py:139-161 idea.

    rankings: (N, K, 2) with [..., 1] the ground-truth depths per list.
    Returns: chi2 (informativeness vs the fixed ideal spread), spread (mean
    sum of adjacent |depth diffs|), eq_frac (fraction of adjacent pairs that
    are near-equal under the reference ratio test, depth_utils.py:5-21),
    sorted_frac (fraction of adjacent pairs in descending order).
    """
    gts = np.asarray(rankings)[..., 1]
    k = gts.shape[-1]
    diffs = np.diff(gts, axis=-1)
    eps = 1e-10
    hi = np.maximum(gts[..., :-1], gts[..., 1:])
    lo = np.minimum(gts[..., :-1], gts[..., 1:])
    ratio = (hi + eps) / (lo + eps)
    return {
        "chi2": compute_chi_sq(np.asarray(rankings), k),
        "spread": float(np.abs(diffs).sum(axis=-1).mean()),
        "eq_frac": float((ratio < 1.0 + threshold).mean()),
        "sorted_frac": float((diffs <= 1e-9).mean()),
    }


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
