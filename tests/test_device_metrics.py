"""Device metrics (eval/device_metrics.py) vs the reference-exact host path.

The scoring arithmetic must be *exactly* the host formulas when fed the same
indices; end-to-end values (device-drawn indices) must track the host
(numpy-seeded) values to within pair-sampling noise.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pldepth_tpu.eval import (
    Evaluator,
    eval_metrics_batch,
    ndcg_at_k,
    ndcg_sampled,
    ordinal_error,
    pairwise_disagreement,
    whdr,
)

H = W = 64


def _maps(rng, corr=0.9):
    gt = rng.uniform(0, 1, (H, W)).astype(np.float32)
    noise = rng.uniform(0, 1, (H, W)).astype(np.float32)
    pred = corr * gt + (1 - corr) * noise
    return pred, gt


@pytest.mark.parametrize("tau", [0.0, 0.03])
@pytest.mark.parametrize("invert", [False, True])
def test_pairwise_disagreement_exact_vs_host(rng, tau, invert):
    """Same indices -> identical value as the host formula."""
    pred, gt = _maps(rng, corr=0.7)
    n = H * W
    idx = rng.choice(n, 1000, replace=False)
    i0, i1 = idx[:500], idx[500:]

    got = float(
        pairwise_disagreement(
            jnp.asarray(pred.reshape(-1)),
            jnp.asarray(gt.reshape(-1)),
            jnp.asarray(i0),
            jnp.asarray(i1),
            tau=tau,
            invert_pred_order=invert,
        )
    )
    # host reference on the same pairs
    p0, p1 = pred.reshape(-1)[i0], pred.reshape(-1)[i1]
    g0, g1 = gt.reshape(-1)[i0], gt.reshape(-1)[i1]
    if tau == 0.0:
        po = p0 > p1
        if invert:
            po = ~po
        want = 1.0 - float(np.mean(po == (g0 > g1)))
    else:
        eps = 1e-10

        def rel(a, b):
            r = (a.astype(np.float64) + eps) / (b + eps)
            return np.where(r >= 1 + tau, 1, np.where(r <= 1 / (1 + tau), -1, 0))

        rp = rel(p0, p1)
        if invert:
            rp = -rp
        want = float(np.mean(rel(g0, g1) != rp))
    assert got == pytest.approx(want, abs=2e-3)  # float32 ratio-edge wobble


def test_ndcg_sampled_exact_vs_host(rng):
    pred, gt = _maps(rng)
    ids = rng.choice(H * W, 200, replace=False)
    got = float(
        ndcg_sampled(
            jnp.asarray(pred.reshape(-1).astype(np.float32)),
            jnp.asarray(gt.reshape(-1).astype(np.float32)),
            jnp.asarray(ids),
        )
    )
    # host arithmetic on the same ids (metrics.ndcg_at_k draws its own, so
    # inline the formula)
    p = pred.reshape(-1).astype(np.float64)
    p = (p - p.min()) / (p.max() - p.min())
    sp, sg = np.sort(p[ids]), np.sort(gt.reshape(-1).astype(np.float64)[ids])

    def dcg(rel):
        return (rel / np.log2(np.arange(rel.size) + 2)).sum()

    want = dcg(1 / (sp + 1)) / dcg(1 / (sg + 1))
    assert got == pytest.approx(want, rel=1e-4)


def test_batch_tracks_host_metrics_statistically(rng):
    preds, gts = zip(*[_maps(rng, corr=0.8) for _ in range(4)])
    preds, gts = np.stack(preds), np.stack(gts)
    m = jax.device_get(
        eval_metrics_batch(
            jax.random.key(0), jnp.asarray(preds), jnp.asarray(gts), tau=0.03
        )
    )
    for i in range(4):
        assert m["ordinal_error"][i] == pytest.approx(
            ordinal_error(preds[i], gts[i]), abs=0.03
        )
        assert m["whdr"][i] == pytest.approx(
            whdr(preds[i], gts[i], tau=0.03), abs=0.03
        )
        assert m["ndcg"][i] == pytest.approx(
            ndcg_at_k(preds[i], gts[i]), abs=0.05
        )


def test_batch_perfect_prediction_and_invert(rng):
    _, gt = _maps(rng)
    gts = np.stack([gt, gt])
    m = eval_metrics_batch(
        jax.random.key(1), jnp.asarray(gts), jnp.asarray(gts), tau=0.03
    )
    np.testing.assert_allclose(np.asarray(m["ordinal_error"]), 0.0)
    np.testing.assert_allclose(np.asarray(m["whdr"]), 0.0, atol=1e-3)
    # descending predictions vs ascending gt, inverted comparison -> perfect
    m2 = eval_metrics_batch(
        jax.random.key(2),
        jnp.asarray(-gts),
        jnp.asarray(gts),
        invert_pred_order=True,
    )
    np.testing.assert_allclose(np.asarray(m2["ordinal_error"]), 0.0)


def test_evaluator_device_report_matches_host(rng):
    """full_report_device ~= full_report through a model-free predictor."""
    from pldepth_tpu.data.datasets import DepthDataset

    n = 5  # odd: exercises the padded final batch
    samples = []
    for _ in range(n):
        pred, gt = _maps(rng, corr=0.85)
        samples.append({"image": np.repeat(pred[..., None], 3, -1), "gt": gt})
    ds = DepthDataset(name="toy", size=n, loader=lambda i: samples[i])

    class IdentityTrainer:
        def predict(self, state, images):
            return jnp.asarray(images)[..., 0]

    ev = Evaluator(IdentityTrainer(), state=None, eval_batch_size=2)
    host = ev.full_report(ds)
    dev = ev.full_report_device(ds)
    assert dev["test_error"] == pytest.approx(host["test_error"], abs=0.03)
    assert dev["whdr_tau_0.03"] == pytest.approx(host["whdr_tau_0.03"], abs=0.03)
    assert dev["ndcg_200"] == pytest.approx(host["ndcg_200"], abs=0.05)
