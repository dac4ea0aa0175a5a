"""ListMLE loss: golden-value parity, gradient checks, pallas/xla agreement.

Golden values come from the closed-form Plackett-Luce NLL (the exact math the
reference's tensorflow_ranking ListMLELoss implements; see
pldepth/losses/nll_loss.py:36 and SURVEY.md §3.3).
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from pldepth_tpu.ops import listmle_nll, gather_ranked_scores, pl_ranking_loss
from pldepth_tpu.ops.listmle import _listmle_sorted_xla


def pl_nll_numpy(scores, labels):
    """Closed-form P-L NLL, naive numpy: product of softmax over suffixes."""
    scores = np.asarray(scores, np.float64)
    labels = np.asarray(labels, np.float64)
    out = np.zeros(scores.shape[0])
    for i in range(scores.shape[0]):
        order = np.argsort(-labels[i], kind="stable")
        s = scores[i][order]
        nll = 0.0
        for k in range(len(s)):
            nll += np.log(np.exp(s[k:]).sum()) - s[k]
        out[i] = nll
    return out


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("n,k", [(1, 2), (4, 5), (7, 3), (130, 25), (3, 128)])
def test_listmle_matches_closed_form(impl, n, k, rng):
    scores = rng.normal(size=(n, k)).astype(np.float32)
    labels = rng.permuted(
        np.tile(np.arange(k, dtype=np.float32), (n, 1)), axis=1
    )  # distinct labels -> unique sort order
    got = np.asarray(listmle_nll(jnp.array(scores), jnp.array(labels), impl=impl))
    want = pl_nll_numpy(scores, labels)
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)


def test_listmle_two_elements_is_logistic(rng):
    # K=2 P-L NLL reduces to -log sigmoid(s_near - s_far).
    s = rng.normal(size=(16, 2)).astype(np.float32)
    labels = np.tile(np.array([2.0, 1.0], np.float32), (16, 1))
    got = np.asarray(listmle_nll(jnp.array(s), jnp.array(labels), impl="xla"))
    want = -np.log(1.0 / (1.0 + np.exp(-(s[:, 0] - s[:, 1])))) - 0.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_listmle_extreme_scores_stable(impl):
    scores = jnp.array([[100.0, 0.0, -100.0], [-50.0, 60.0, 0.0]], jnp.float32)
    labels = jnp.array([[3.0, 2.0, 1.0], [3.0, 2.0, 1.0]], jnp.float32)
    nll = listmle_nll(scores, labels, impl=impl)
    assert np.all(np.isfinite(np.asarray(nll)))
    g = jax.grad(lambda s: listmle_nll(s, labels, impl=impl).sum())(scores)
    assert np.all(np.isfinite(np.asarray(g)))


@pytest.mark.parametrize("impl", ["xla", "pallas"])
@pytest.mark.parametrize("n,k", [(4, 5), (9, 13)])
def test_listmle_grad_matches_numeric(impl, n, k, rng):
    scores = rng.normal(size=(n, k)).astype(np.float32)
    labels = rng.permuted(np.tile(np.arange(k, dtype=np.float32), (n, 1)), axis=1)
    labels_j = jnp.array(labels)

    def f(s):
        return listmle_nll(s, labels_j, impl=impl).sum()

    g = np.asarray(jax.grad(f)(jnp.array(scores)))
    # central differences on the float64 closed form (fp32 differencing of the
    # jitted fn is too noisy for a tight tolerance)
    eps = 1e-5
    for _ in range(10):
        i, j = rng.integers(n), rng.integers(k)
        e = np.zeros_like(scores, np.float64)
        e[i, j] = eps
        num = (
            pl_nll_numpy(scores + e, labels).sum()
            - pl_nll_numpy(scores - e, labels).sum()
        ) / (2 * eps)
        np.testing.assert_allclose(g[i, j], num, rtol=1e-3, atol=1e-5)


def test_pallas_xla_agree_fwd_bwd(rng):
    n, k = 37, 10
    scores = jnp.array(rng.normal(size=(n, k)).astype(np.float32))
    labels = jnp.array(
        rng.permuted(np.tile(np.arange(k, dtype=np.float32), (n, 1)), axis=1)
    )
    f_x = lambda s: listmle_nll(s, labels, impl="xla")
    f_p = lambda s: listmle_nll(s, labels, impl="pallas")
    np.testing.assert_allclose(np.asarray(f_x(scores)), np.asarray(f_p(scores)), rtol=1e-5, atol=1e-5)
    gx = jax.grad(lambda s: f_x(s).sum())(scores)
    gp = jax.grad(lambda s: f_p(s).sum())(scores)
    np.testing.assert_allclose(np.asarray(gx), np.asarray(gp), rtol=1e-4, atol=1e-5)


def test_gather_ranked_scores_semantics(rng):
    # Mirrors prepare_fully_fledged_loss_input (depth_utils.py:39-61):
    # flat index = x * W + y into the per-image flattened map.
    b, h, w, rpi, k = 2, 4, 5, 3, 2
    pred = rng.normal(size=(b, h, w, 1)).astype(np.float32)
    idx = rng.integers(0, h * w, size=(b, rpi, k)).astype(np.int32)
    got = np.asarray(gather_ranked_scores(jnp.array(pred), jnp.array(idx)))
    want = np.zeros((b * rpi, k), np.float32)
    for bi in range(b):
        flat = pred[bi].reshape(-1)
        for r in range(rpi):
            for j in range(k):
                want[bi * rpi + r, j] = flat[idx[bi, r, j]]
    np.testing.assert_allclose(got, want)


def test_pl_ranking_loss_end_to_end(rng):
    b, h, w, rpi, k = 2, 8, 8, 4, 3
    pred = jnp.array(rng.normal(size=(b, h, w, 1)).astype(np.float32))
    idx = rng.integers(0, h * w, size=(b, rpi, k))
    depths = np.sort(rng.uniform(0.1, 1.0, size=(b, rpi, k)), axis=-1)[..., ::-1]
    rankings = jnp.array(
        np.stack([idx, depths], axis=-1).astype(np.float32)
    )
    loss = pl_ranking_loss(pred, rankings, impl="xla")
    assert np.isfinite(float(loss))
    # grad flows into the map via scatter-add
    g = jax.grad(lambda p: pl_ranking_loss(p, rankings, impl="xla"))(pred)
    assert np.asarray(jnp.abs(g)).sum() > 0


def test_uniform_scores_loss_is_log_k_factorial():
    # If all scores equal, P-L likelihood of any order is 1/K!.
    k = 6
    scores = jnp.zeros((3, k))
    labels = jnp.tile(jnp.arange(k, 0, -1, dtype=jnp.float32), (3, 1))
    nll = np.asarray(listmle_nll(scores, labels, impl="xla"))
    want = np.sum(np.log(np.arange(1, k + 1)))
    np.testing.assert_allclose(nll, want, rtol=1e-5)


@pytest.mark.slow
@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_listmle_sweep_extreme_k500(impl, rng):
    """The reference's sweep space explores ranking_size up to 500
    (hyperopt/hyperparams.py:44); the kernel must stay exact there
    (K pads to 504 sublane rows, triangular matmuls go (504, 504))."""
    n, k = 40, 500
    scores = rng.normal(size=(n, k)).astype(np.float32)
    labels = rng.permuted(
        np.tile(np.arange(k, dtype=np.float32), (n, 1)), axis=1
    )
    got = np.asarray(listmle_nll(jnp.array(scores), jnp.array(labels), impl=impl))
    want = pl_nll_numpy(scores, labels)
    np.testing.assert_allclose(got, want, rtol=4e-5, atol=4e-4)
    g = jax.grad(lambda s: listmle_nll(s, jnp.array(labels), impl=impl).sum())(
        jnp.array(scores)
    )
    assert np.isfinite(np.asarray(g)).all()


@pytest.mark.parametrize("impl", ["xla", "pallas"])
def test_listmle_large_inlist_spread_exact(impl):
    """Scores spanning more than the float32 exp range (~87) within one
    list: a single-global-max kernel underflows every term of the deep
    suffixes and reports a huge spurious loss (observed 34.8 vs 2e-22).
    The per-suffix logsumexp must stay exact and the gradient of an
    already-perfectly-ordered list must be ~0."""
    scores = np.array([[0.0, -50.0, -120.0], [5.0, -100.0, -230.0]],
                      np.float32)
    labels = np.tile(np.array([3.0, 2.0, 1.0], np.float32), (2, 1))
    got = np.asarray(listmle_nll(jnp.array(scores), jnp.array(labels), impl=impl))
    want = pl_nll_numpy(scores, labels)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-6)
    g = jax.grad(lambda s: listmle_nll(s, jnp.array(labels), impl=impl).sum())(
        jnp.array(scores)
    )
    assert np.abs(np.asarray(g)).max() < 1e-4
