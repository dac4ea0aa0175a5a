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

from pldepth_tpu.active.acquisition import (
    input_edge_map,
    oracle_label,
    pred_edge_map,
    tile_hausdorff_batch,
)
from pldepth_tpu.data.datasets import DepthDataset

log = logging.getLogger(__name__)


def _stream_batches(trainer, state, ds, predict_batch, row_subset=None):
    """Yield (rows, items, preds_device) per predict batch, images uploaded
    from host. Dispatches are async — the caller prefetches one batch ahead
    so the device forward overlaps the host-side Canny work (the reference
    blocked per image, active_learning_method.py:101). ``row_subset``
    restricts to specific dataset rows (used to cover the resident store's
    truncation remainder)."""
    from pldepth_tpu.core.mesh import pad_to_batch

    predict = trainer.jit_predict()
    all_rows = list(range(len(ds))) if row_subset is None else list(row_subset)
    for start in range(0, len(all_rows), predict_batch):
        rows = all_rows[start : start + predict_batch]
        items = [ds[i] for i in rows]
        imgs = np.stack([s["image"] for s in items])
        yield rows, items, predict(state, pad_to_batch(imgs, predict_batch))


def _resident_batches(trainer, state, ds, store, predict_batch):
    """Yield (rows, items, preds_device) with the forward reading images
    straight out of the HBM-resident store — zero per-batch host→device
    traffic (only predictions come back). Row order is device-major over the
    store's data-axis shards; tail batches overlap already-covered rows
    (the caller dedupes)."""
    d = trainer.mesh.axis_names[0]
    dsize = trainer.mesh.shape[d]
    n_local = store.n // dsize
    bl = max(1, min(predict_batch // dsize, n_local))
    predict_r = trainer.jit_predict_resident(bl)
    starts = list(range(0, n_local - bl + 1, bl))
    if starts[-1] + bl < n_local:
        starts.append(n_local - bl)  # overlapping tail
    for start in starts:
        rows = [k * n_local + start + j for k in range(dsize) for j in range(bl)]
        items = [ds[i] for i in rows]
        yield rows, items, predict_r(state, store.arrays["image"], start)


def active_learning_round(
    trainer,
    state,
    ds: DepthDataset,
    *,
    split: int = 32,
    sigma: float = 1.8,
    seed: int = 0,
    predict_batch: int = 8,
    store=None,
):
    """Acquire + oracle-label the whole pool -> arrays for fixed-ranking fit.

    ``store``: optional ResidentStore holding the pool — predictions then
    read images from HBM instead of re-uploading them every batch.
    Returns (images (N,H,W,3), rankings (N, L, K, 2), stats dict).
    """
    from pldepth_tpu.core.mesh import round_batch

    k = trainer.cfg.ranking_size
    rng = np.random.default_rng(seed)
    by_row = {}  # row -> (image, lists, mean, var); rows may arrive out of order
    predict_batch = round_batch(predict_batch, trainer.mesh)

    if store is not None:
        gen = _resident_batches(trainer, state, ds, store, predict_batch)
        if store.n < len(ds):
            # The store truncates the pool to a multiple of the data-axis
            # size at build time; without this the dropped tail rows would
            # be silently excluded from every acquisition round relative to
            # the streaming path. Cover them via one streaming tail batch.
            import itertools

            tail_rows = range(store.n, len(ds))
            log.info(
                "resident store covers %d/%d pool rows; streaming the "
                "%d-row remainder", store.n, len(ds), len(ds) - store.n,
            )
            gen = itertools.chain(
                gen,
                _stream_batches(
                    trainer, state, ds, predict_batch, row_subset=tail_rows
                ),
            )
    else:
        gen = _stream_batches(trainer, state, ds, predict_batch)

    pending = next(gen)
    while pending is not None:
        rows, items, preds_dev = pending
        pending = next(gen, None)  # async-dispatch the next batch first
        # host Canny on the inputs runs while the device computes
        keep = [j for j, r in enumerate(rows) if r not in by_row]
        in_edges = np.stack([input_edge_map(items[j]["image"]) for j in keep])
        preds = np.asarray(preds_dev)  # sync this batch only
        pred_edges = np.stack([pred_edge_map(preds[j], sigma) for j in keep])
        # one device call per batch replaces the numpy per-image/per-tile
        # Hausdorff (the dominant host cost — docs/BENCH.md "Active learning")
        dist_b, pts_b = tile_hausdorff_batch(in_edges, pred_edges, split)
        for jj, j in enumerate(keep):
            s = items[j]
            dist, pts = dist_b[jj], pts_b[jj]
            lists = oracle_label(s["gt"], pts, k, rng)
            by_row[rows[j]] = (
                s["image"], lists, float(dist.mean()), float(dist.var())
            )

    ordered = [by_row[r] for r in sorted(by_row)]
    images = [t[0] for t in ordered]
    rankings = [t[1] for t in ordered]
    means = [t[2] for t in ordered]
    variances = [t[3] for t in ordered]

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
    store=None,
) -> Tuple["TrainState", Dict[str, List[float]]]:
    """The full loop: reference active_PLDepth.py:160-185 semantics."""
    from pldepth_tpu.eval.evaluator import Evaluator

    history: Dict[str, List[float]] = {"loss": [], "err": [], "hd_mean": []}
    for r in range(rounds):
        images, rankings, stats = active_learning_round(
            trainer, state, pool, split=split, sigma=sigma, seed=seed + r,
            store=store,
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
