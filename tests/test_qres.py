"""Compressed-residual training (ops/qres.py, ``--qres int8|bf16``).

Forward must be IDENTICAL to the standard flax-BatchNorm path (only the
backward residual changes); gradients are perturbed by the compression
but must stay close; the trainer must run end-to-end with the flag.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.models import get_pl_depth_net
from pldepth_tpu.train import Trainer

S = 64


def _model(qres):
    return get_pl_depth_net("ff_smoke", compute_dtype="float32", qres=qres)


def _train_fwd(model, variables, x):
    return model.module.apply(
        variables, x, True,
        rngs={"droppath": jax.random.key(1)}, mutable=["batch_stats"],
    )


@pytest.fixture
def data(rng):
    return jnp.array(rng.normal(size=(2, S, S, 3)).astype(np.float32))


def test_qres_forward_identical(data):
    """qres changes the backward residual only: train-mode forward and the
    batch_stats update must match the standard path to float tolerance."""
    base = _model(None)
    variables = base.init_variables(jax.random.key(0), (S, S, 3))
    out0, upd0 = _train_fwd(base, variables, data)
    for store in ("int8", "bf16"):
        outq, updq = _train_fwd(_model(store), variables, data)
        np.testing.assert_allclose(
            np.asarray(out0), np.asarray(outq), rtol=0, atol=1e-5
        )
        l0 = jax.tree_util.tree_leaves(upd0["batch_stats"])
        lq = jax.tree_util.tree_leaves(updq["batch_stats"])
        for a, b in zip(l0, lq):
            np.testing.assert_allclose(
                np.asarray(a), np.asarray(b), rtol=0, atol=1e-5
            )


def test_qres_eval_identical(data):
    base = _model(None)
    variables = base.init_variables(jax.random.key(0), (S, S, 3))
    out0 = base.module.apply(variables, data, False)
    for store in ("int8", "bf16"):
        outq = _model(store).module.apply(variables, data, False)
        np.testing.assert_allclose(
            np.asarray(out0), np.asarray(outq), rtol=0, atol=1e-5
        )


def _grads(model, variables, x):
    params = variables["params"]
    rest = {k: v for k, v in variables.items() if k != "params"}

    def loss_fn(p):
        out, _ = model.module.apply(
            {"params": p, **rest}, x, True,
            rngs={"droppath": jax.random.key(1)}, mutable=["batch_stats"],
        )
        # fixed pseudo-random cotangent so every output pixel matters
        w = jnp.sin(jnp.arange(out.size, dtype=jnp.float32)).reshape(out.shape)
        return jnp.sum(out.astype(jnp.float32) * w)

    return jax.grad(loss_fn)(params)


@pytest.mark.slow  # three full fwd+bwd grad compiles (base/bf16/int8)
def test_qres_gradients_close(data):
    """Compression perturbs gradients; bound the relative L2 error per
    leaf. bf16 x-hat keeps ~3 significant digits; int8 is coarser."""
    base = _model(None)
    variables = base.init_variables(jax.random.key(0), (S, S, 3))
    g0 = _grads(base, variables, data)
    # Per-leaf denominators are floored at 1% of the largest leaf norm:
    # BN backward mean-subtracts, so some bias grads are near-zero by
    # structural cancellation and a plain relative error there measures
    # nothing but the broken cancellation of a negligible value.
    gmax = max(
        float(jnp.linalg.norm(a.ravel()))
        for a in jax.tree_util.tree_leaves(g0)
    )
    for store, tol in (("bf16", 2e-2), ("int8", 2e-1)):
        gq = _grads(_model(store), variables, data)
        errs = {}
        for (path, a), (_, b) in zip(
            jax.tree_util.tree_leaves_with_path(g0),
            jax.tree_util.tree_leaves_with_path(gq),
        ):
            denom = max(float(jnp.linalg.norm(a.ravel())), 1e-2 * gmax)
            rel = float(jnp.linalg.norm((a - b).ravel())) / denom
            errs[jax.tree_util.keystr(path)] = rel
        worst = max(errs.values())
        assert worst < tol, (
            f"{store}: worst rel grad err {worst:.3f} at "
            f"{max(errs, key=errs.get)}"
        )
        # the overall gradient direction must survive compression
        va = jnp.concatenate([a.ravel() for a in jax.tree_util.tree_leaves(g0)])
        vb = jnp.concatenate([b.ravel() for b in jax.tree_util.tree_leaves(gq)])
        cos = float(
            jnp.vdot(va, vb) / (jnp.linalg.norm(va) * jnp.linalg.norm(vb))
        )
        assert cos > 0.999, f"{store}: cosine {cos}"


@pytest.mark.slow  # builds two Trainers (standard + qres train steps)
def test_qres_train_step_runs(data):
    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=S, batch_size=2, ranking_size=3,
        rankings_per_image=4, sampling_type=1, qres="int8",
        compute_dtype="float32",
    )
    t = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))
    state = t.init_state()
    cfg0 = cfg.replace(qres="")
    t0 = Trainer(cfg0, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))

    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset

    ds = SyntheticDepthDataset(n=4, image_size=S, seed=0)
    it = BatchIterator(ds, 2, seed=0)
    batch = t.shard_batch(next(it))
    it.close()
    state_q, m_q = t.train_step(state, batch)
    assert np.isfinite(float(m_q.loss))
    # forward is exact, so the reported loss equals the uncompressed one
    _, m_0 = t0.train_step(t0.init_state(), batch)
    np.testing.assert_allclose(
        float(m_q.loss), float(m_0.loss), rtol=1e-5
    )


def test_qres_rejects_redweb():
    with pytest.raises(ValueError):
        get_pl_depth_net("ff_redweb", qres="int8")
