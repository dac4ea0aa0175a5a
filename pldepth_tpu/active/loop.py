"""Active-learning training loop.

Replaces the reference round drivers (run_scripts/active_PLDepth.py:160-185,
active_on_base.py:129-147): after (or instead of) base pretraining, run N
rounds of [acquire disagreement pixels -> oracle-label rankings -> fit one
epoch on the acquired pool], tracking per-round ordinal error.
"""

from __future__ import annotations

import logging
from typing import Dict, List, Optional, Tuple

import jax
import numpy as np

from pldepth_tpu.active.acquisition import acquire_pixels, oracle_label
from pldepth_tpu.data.datasets import DepthDataset

log = logging.getLogger(__name__)


def active_learning_round(
    trainer,
    state,
    ds: DepthDataset,
    *,
    split: int = 32,
    sigma: float = 1.8,
    seed: int = 0,
    predict_batch: int = 8,
):
    """Acquire + oracle-label the whole pool -> arrays for fixed-ranking fit.

    Returns (images (N,H,W,3), rankings (N, L, K, 2), stats dict).
    """
    from pldepth_tpu.core.mesh import pad_to_batch, round_batch

    k = trainer.cfg.ranking_size
    rng = np.random.default_rng(seed)
    images, rankings, means, variances = [], [], [], []
    predict = trainer.jit_predict()  # data-parallel over the trainer's mesh
    predict_batch = round_batch(predict_batch, trainer.mesh)

    n = len(ds)
    for start in range(0, n, predict_batch):
        items = [ds[i] for i in range(start, min(start + predict_batch, n))]
        imgs = np.stack([s["image"] for s in items])
        preds = np.asarray(predict(state, pad_to_batch(imgs, predict_batch)))
        for j, s in enumerate(items):
            pos, pts, m, v = acquire_pixels(s["image"], preds[j], split, sigma)
            lists = oracle_label(s["gt"], pts, k, rng)
            images.append(s["image"])
            rankings.append(lists)
            means.append(m)
            variances.append(v)

    stats = {
        "avg_hd_mean": float(np.mean(means)),
        "avg_hd_var": float(np.mean(variances)),
    }
    return np.stack(images), np.stack(rankings).astype(np.float32), stats


def fit_on_fixed_rankings(trainer, state, images, rankings, steps: int, seed: int = 0):
    """One epoch of fixed-ranking training (reference: model.fit on the
    active dataset for one epoch per round)."""
    n = images.shape[0]
    bs = trainer.cfg.batch_size
    rng = np.random.default_rng(seed)
    order = rng.permutation(n)
    losses = []
    step_count = 0
    for b in range(n // bs):
        if step_count >= steps:
            break
        idx = order[b * bs : (b + 1) * bs]
        batch = trainer.shard_batch(
            {"image": images[idx], "rankings": rankings[idx]}
        )
        state, metrics = trainer.train_step_fixed(state, batch)
        losses.append(metrics.loss)
        step_count += 1
    losses = [float(x) for x in jax.device_get(losses)] if losses else [float("nan")]
    return state, float(np.mean(losses))


def run_active_loop(
    trainer,
    state,
    pool: DepthDataset,
    *,
    rounds: int = 6,
    split: int = 32,
    sigma: float = 1.8,
    eval_ds: Optional[DepthDataset] = None,
    eval_limit: Optional[int] = 50,
    seed: int = 0,
    logger=None,
) -> Tuple["TrainState", Dict[str, List[float]]]:
    """The full loop: reference active_PLDepth.py:160-185 semantics."""
    from pldepth_tpu.eval.evaluator import Evaluator

    history: Dict[str, List[float]] = {"loss": [], "err": [], "hd_mean": []}
    for r in range(rounds):
        images, rankings, stats = active_learning_round(
            trainer, state, pool, split=split, sigma=sigma, seed=seed + r
        )
        steps = max(1, images.shape[0] // trainer.cfg.batch_size)
        state, loss = fit_on_fixed_rankings(
            trainer, state, images, rankings, steps, seed=seed + r
        )
        history["loss"].append(loss)
        history["hd_mean"].append(stats["avg_hd_mean"])
        if eval_ds is not None:
            err = Evaluator(trainer, state).calc_err(eval_ds, limit=eval_limit)
            history["err"].append(err)
        log.info(
            "active round %d: loss=%.4f hd_mean=%.2f err=%s",
            r, loss, stats["avg_hd_mean"],
            f"{history['err'][-1]:.4f}" if eval_ds is not None else "-",
        )
        if logger is not None:
            logger.log({"active_round": r, "active_loss": loss, **stats})
    return state, history
