"""Metric definitions: sanity + invariance properties."""

import numpy as np
import pytest

from pldepth_tpu.eval.metrics import (
    depth_edge_metric,
    ndcg_at_k,
    ordinal_error,
    whdr,
)

H = W = 64


def test_ordinal_error_perfect_and_inverted(rng):
    gt = rng.uniform(0, 1, (H, W)).astype(np.float32)
    assert ordinal_error(gt, gt, num_pairs=500) == 0.0
    assert ordinal_error(-gt, gt, num_pairs=500) == pytest.approx(1.0, abs=0.02)
    # monotone transform of predictions leaves the metric unchanged
    assert ordinal_error(np.exp(3 * gt), gt, num_pairs=500) == 0.0


def test_ordinal_error_invert_flag_for_ascending_gt(rng):
    gt = rng.uniform(0, 1, (H, W)).astype(np.float32)
    # model predicts descending scores; ascending-depth dataset (closer =
    # smaller gt) must be compared inverted
    pred = -gt  # perfect *descending* prediction for ascending gt
    assert ordinal_error(pred, gt, num_pairs=500, invert_pred_order=True) == 0.0


def test_whdr_tau_tolerates_near_equal(rng):
    gt = np.ones((H, W), np.float32)
    pred = 1.0 + rng.uniform(-0.001, 0.001, (H, W)).astype(np.float32)
    # all gt pairs are tau-equal, predictions within tau band -> zero WHDR
    assert whdr(pred, gt, tau=0.03, num_pairs=500) == 0.0
    # tau=0 ordinal error would be ~0.5 on the same data
    assert ordinal_error(pred, gt, num_pairs=500) > 0.3


def test_ndcg_identical_full_range_is_one(rng):
    # pred is minmax-normalized, gt is not (reference calc_d); identical
    # full-range [0,1] maps are a fixed point -> exactly 1
    gt = rng.uniform(0, 1, (H, W)).astype(np.float64)
    gt.reshape(-1)[0], gt.reshape(-1)[1] = 0.0, 1.0
    val = ndcg_at_k(gt, gt, list_size=50)
    assert val == pytest.approx(1.0, abs=1e-9)


def test_ndcg_scale_invariant_in_pred(rng):
    # minmax normalization makes the metric invariant to pred affine scale
    gt = rng.uniform(0, 1, (H, W)).astype(np.float64)
    pred = rng.uniform(0, 1, (H, W)).astype(np.float64)
    v1 = ndcg_at_k(pred, gt, list_size=50)
    v2 = ndcg_at_k(5.0 * pred + 3.0, gt, list_size=50)
    assert v1 == pytest.approx(v2, rel=1e-9)
    assert np.isfinite(v1) and v1 > 0


def test_depth_edge_metric_reference_quirk_semantics():
    # The reference transforms the edge map directly (not its inverse), so
    # aligned 1-px edges score ~1 and displaced edges score ~0 — see the
    # docstring note in eval/metrics.py.
    gt = np.zeros((H, W), np.float32)
    gt[:, W // 2 :] = 1.0  # one sharp edge
    b_same, c_same = depth_edge_metric(gt, gt)
    pred = np.zeros((H, W), np.float32)
    pred[:, W // 2 + 8 :] = 1.0  # edge displaced by 8 px
    b_shift, c_shift = depth_edge_metric(pred, gt)
    assert b_same > 0.5 and c_same > 0.5
    assert b_shift < 0.1 and c_shift < 0.1
