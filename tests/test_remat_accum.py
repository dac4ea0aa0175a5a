"""Remat equivalence and gradient-accumulation semantics."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
from pldepth_tpu.models import get_pl_depth_net
from pldepth_tpu.train import Trainer

S = 64


def test_remat_model_matches_plain():
    plain = get_pl_depth_net("ff_smoke", compute_dtype="float32", remat=False)
    remat = get_pl_depth_net("ff_smoke", compute_dtype="float32", remat=True)
    v = plain.init_variables(jax.random.key(0), (S, S, 3))
    v2 = remat.init_variables(jax.random.key(0), (S, S, 3))
    # same parameter structure and values (remat must not rename/reinit)
    jax.tree_util.tree_all(
        jax.tree_util.tree_map(
            lambda a, b: np.testing.assert_array_equal(np.asarray(a), np.asarray(b)),
            v["params"], v2["params"],
        )
    )
    x = jnp.array(np.random.default_rng(0).normal(size=(2, S, S, 3)).astype(np.float32))
    np.testing.assert_allclose(
        np.asarray(plain.module.apply(v, x, False)),
        np.asarray(remat.module.apply(v2, x, False)),
        atol=1e-5,
    )
    # gradients agree too (remat only changes the schedule, not the math)
    def loss(module, vars_, x):
        return module.apply(vars_, x, False).sum()

    g1 = jax.jit(jax.grad(lambda p: loss(plain.module, {**v, "params": p}, x)))(
        v["params"]
    )
    g2 = jax.jit(jax.grad(lambda p: loss(remat.module, {**v2, "params": p}, x)))(
        v2["params"]
    )
    for a, b in zip(jax.tree_util.tree_leaves(g1), jax.tree_util.tree_leaves(g2)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-4)


def test_grad_accum_updates_every_k_steps():
    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=S, batch_size=8, ranking_size=3,
        rankings_per_image=8, sampling_type=1, freeze_encoder=False,
        compute_dtype="float32", listmle_impl="xla", initial_lr=1e-3,
        grad_accum=2,
    )
    # 1-device mesh: accumulation semantics are mesh-independent (compile
    # cost, see test_trainer_e2e.mesh1)
    from pldepth_tpu.core.mesh import make_mesh

    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=8, image_size=S, seed=0)
    it = BatchIterator(ds, cfg.batch_size, seed=0)
    p0 = np.asarray(jax.device_get(state.params["decoder"]["head"]["kernel"]))
    state, _ = trainer.train_step(state, trainer.shard_batch(next(it)))
    p1 = np.asarray(jax.device_get(state.params["decoder"]["head"]["kernel"]))
    np.testing.assert_array_equal(p0, p1)  # microbatch 1 of 2: no update yet
    state, _ = trainer.train_step(state, trainer.shard_batch(next(it)))
    p2 = np.asarray(jax.device_get(state.params["decoder"]["head"]["kernel"]))
    it.close()
    assert not np.array_equal(p1, p2), "update must land on the k-th microbatch"


def test_grad_accum_schedule_runs_on_microstep_clock():
    """MultiSteps advances the inner optimizer count once per k micro-steps;
    the inner schedule must rescale by k so the LR decays on the intended
    micro-step horizon (and matches the logged metrics.lr clock)."""
    from pldepth_tpu.core.mesh import make_mesh

    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=S, batch_size=8, ranking_size=3,
        rankings_per_image=8, sampling_type=1, compute_dtype="float32",
        listmle_impl="xla", initial_lr=1e-3, grad_accum=4, epochs=2,
    )
    tr = Trainer(cfg, steps_per_epoch=10,
                 mesh=make_mesh(devices=jax.devices()[:1]))
    tr._ensure_tx()
    for inner_count in (0, 1, 3, 5):
        np.testing.assert_allclose(
            float(tr._inner_schedule(inner_count)),
            float(tr.schedule(inner_count * 4)),
        )
    # and without accumulation the schedule is used as-is
    cfg1 = cfg.replace(grad_accum=1)
    tr1 = Trainer(cfg1, steps_per_epoch=10,
                  mesh=make_mesh(devices=jax.devices()[:1]))
    tr1._ensure_tx()
    assert tr1._inner_schedule is tr1.schedule
