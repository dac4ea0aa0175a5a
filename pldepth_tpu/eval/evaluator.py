"""Batched evaluation over datasets, incl. the zero-shot cross-dataset suite.

Replaces the reference's per-image predict loops (calc_err/dcg_metric/
calc_depth_metrics, pldepth/active_learning/metrics.py:73-155, and
test_data_eval.py:30-104) with device-batched inference; metric arithmetic
stays reference-identical (eval/metrics.py).

Zero-shot convention: HR-WSI gt is descending (closer = larger), while
Ibims/Sintel/DIODE/TUM are ascending (reference pl_hourglass.py:22-31;
invert_relation_sign in generic_ranking_provider.py) — the evaluator flips
the predicted order for ascending datasets via ``ds.asc_depth_order``.
"""

from __future__ import annotations

import logging
from typing import Dict, Iterable, List, Optional

import jax
import jax.numpy as jnp
import numpy as np

from pldepth_tpu.core.mesh import pad_to_batch, round_batch
from pldepth_tpu.data.datasets import DepthDataset
from pldepth_tpu.eval import metrics as M
from pldepth_tpu.eval.device_metrics import eval_metrics_batch

log = logging.getLogger(__name__)


class Evaluator:
    def __init__(self, trainer, state, eval_batch_size: int = 8):
        self.trainer = trainer
        self.state = state
        # data-parallel over the trainer's mesh; the dispatch batch must
        # divide evenly over the data axis. Duck-typed: any object with a
        # predict(state, images) works (model-free predictors in tests).
        if hasattr(trainer, "jit_predict"):
            self._predict = trainer.jit_predict()
            self.batch_size = round_batch(eval_batch_size, trainer.mesh)
        else:
            self._predict = jax.jit(trainer.predict)
            self.batch_size = eval_batch_size

    def _predict_dataset(self, ds: DepthDataset, limit: Optional[int] = None):
        n = min(len(ds), limit) if limit is not None else len(ds)
        for start in range(0, n, self.batch_size):
            idxs = range(start, min(start + self.batch_size, n))
            items = [ds[i] for i in idxs]
            images = np.stack([s["image"] for s in items])
            images = pad_to_batch(images, self.batch_size)
            preds = np.asarray(self._predict(self.state, images))
            for j, s in enumerate(items):
                yield preds[j], s["gt"]

    # -- reference-equivalent aggregate metrics ---------------------------
    def calc_err(
        self, ds: DepthDataset, limit: Optional[int] = None, tau: float = 0.0
    ) -> float:
        """Mean ordinal error (reference calc_err, metrics.py:73-80)."""
        errs = [
            M.ordinal_error(p, g, invert_pred_order=ds.asc_depth_order)
            if tau == 0.0
            else M.whdr(p, g, tau=tau, invert_pred_order=ds.asc_depth_order)
            for p, g in self._predict_dataset(ds, limit)
        ]
        return float(np.mean(errs))

    def dcg_metric(
        self, ds: DepthDataset, list_size: int = 200, limit: Optional[int] = None
    ) -> float:
        vals = [
            M.ndcg_at_k(p, g, list_size=list_size)
            for p, g in self._predict_dataset(ds, limit)
        ]
        return float(np.mean(vals))

    def calc_depth_metrics(self, ds: DepthDataset, limit: Optional[int] = None):
        pairs = [M.depth_edge_metric(p, g) for p, g in self._predict_dataset(ds, limit)]
        arr = np.asarray(pairs, np.float64)
        arr = arr[np.all(np.isfinite(arr), axis=1)]
        return float(arr[:, 0].mean()), float(arr[:, 1].mean())

    def full_report(
        self, ds: DepthDataset, limit: Optional[int] = None, tau: float = 0.03
    ) -> Dict[str, float]:
        """test_data_eval.py equivalent: ordinal error, WHDR(tau), NDCG@200,
        boundary + completeness."""
        preds = list(self._predict_dataset(ds, limit))
        inv = ds.asc_depth_order
        report = {
            "test_error": float(
                np.mean([M.ordinal_error(p, g, invert_pred_order=inv) for p, g in preds])
            ),
            f"whdr_tau_{tau}": float(
                np.mean([M.whdr(p, g, tau=tau, invert_pred_order=inv) for p, g in preds])
            ),
            "ndcg_200": float(np.mean([M.ndcg_at_k(p, g) for p, g in preds])),
        }
        try:
            edges = np.asarray([M.depth_edge_metric(p, g) for p, g in preds])
            edges = edges[np.all(np.isfinite(edges), axis=1)]
            if len(edges):  # all-smooth maps can yield zero Canny edges
                report["depth_boundary_metric"] = float(edges[:, 0].mean())
                report["depth_completeness"] = float(edges[:, 1].mean())
        except RuntimeError:  # pragma: no cover - cv2 missing
            pass
        return report

    def full_report_device(
        self,
        ds: DepthDataset,
        limit: Optional[int] = None,
        tau: float = 0.03,
        seed: int = 0,
    ) -> Dict[str, float]:
        """full_report on the device fast path (eval/device_metrics.py).

        Inference AND metric arithmetic stay on device; the host receives
        three scalars per image instead of the full-resolution maps. Pair
        sampling uses jax.random, so values track the host (reference-
        seeded) path to within sampling noise (~0.008 at 5000 pairs), not
        bitwise. Edge metrics remain host-side (cv2 Canny has no device
        equivalent here) — use full_report when those are needed.
        """
        inv = ds.asc_depth_order
        key = jax.random.key(seed)
        n = min(len(ds), limit) if limit else len(ds)
        per_image: Dict[str, List[np.ndarray]] = {
            "ordinal_error": [], "whdr": [], "ndcg": []
        }
        for bi, start in enumerate(range(0, n, self.batch_size)):
            items = [ds[i] for i in range(start, min(start + self.batch_size, n))]
            images = np.stack([s["image"] for s in items])
            gts = np.stack([np.squeeze(np.asarray(s["gt"])) for s in items])
            # keep one compiled shape; padded rows are discarded
            images = pad_to_batch(images, self.batch_size)
            gts = pad_to_batch(gts, self.batch_size, fill=1.0)
            preds = self._predict(self.state, images)
            m = eval_metrics_batch(
                jax.random.fold_in(key, bi),
                preds,
                jnp.asarray(gts),
                tau=tau,
                invert_pred_order=inv,
            )
            host = jax.device_get(m)
            for k in per_image:
                per_image[k].append(host[k][: len(items)])
        return {
            "test_error": float(np.mean(np.concatenate(per_image["ordinal_error"]))),
            f"whdr_tau_{tau}": float(np.mean(np.concatenate(per_image["whdr"]))),
            "ndcg_200": float(np.mean(np.concatenate(per_image["ndcg"]))),
        }

    def zero_shot_suite(
        self, datasets: Iterable[DepthDataset], limit: Optional[int] = None
    ) -> Dict[str, Dict[str, float]]:
        """Cross-dataset ordinal eval (BASELINE.json config #4)."""
        out = {}
        for ds in datasets:
            # one inference pass scores both metrics (calc_err twice would
            # re-run the model over the whole dataset)
            inv = ds.asc_depth_order
            errs, whdrs = [], []
            for p, g in self._predict_dataset(ds, limit):
                errs.append(M.ordinal_error(p, g, invert_pred_order=inv))
                whdrs.append(M.whdr(p, g, tau=0.03, invert_pred_order=inv))
            out[ds.name] = {
                "ordinal_error": float(np.mean(errs)),
                "whdr_0.03": float(np.mean(whdrs)),
            }
            log.info("zero-shot %s: %s", ds.name, out[ds.name])
        return out
