"""End-to-end: the fused train step learns on a tiny synthetic set, on an
8-device virtual mesh (SURVEY.md §4 items 4-5: sharding + overfit smoke)."""

import numpy as np
import jax
import pytest

pytestmark = pytest.mark.slow

from pldepth_tpu.core.config import ExperimentConfig, MeshConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.data import (
    BatchIterator,
    SyntheticDepthDataset,
    pregenerate_val_rankings,
    val_batches,
)
from pldepth_tpu.train import Trainer

S = 64


def mesh1():
    """1-device mesh for tests whose behavior is mesh-independent: a full
    train-step compile on the 8-way virtual mesh costs minutes on this
    1-core host; SPMD itself is covered by the loss-decrease and sharding
    tests below plus the driver's dryrun_multichip."""
    import jax as _jax

    return make_mesh(devices=_jax.devices()[:1])


def tiny_cfg(**kw):
    base = dict(
        model_name="ff_effnet",
        input_size=S,
        batch_size=8,
        ranking_size=4,
        rankings_per_image=16,
        epochs=1,
        initial_lr=3e-4,
        sampling_type=1,
        freeze_encoder=False,  # random init: encoder must learn
        compute_dtype="float32",
        augmentation=True,
        listmle_impl="xla",
    )
    base.update(kw)
    return ExperimentConfig(**base)


@pytest.fixture(scope="module")
def ds():
    return SyntheticDepthDataset(n=16, image_size=S, seed=3)


def test_train_step_runs_and_loss_decreases(ds):
    cfg = tiny_cfg()
    trainer = Trainer(cfg, steps_per_epoch=2)
    assert len(trainer.mesh.devices.flatten()) == 8  # virtual CPU mesh
    state = trainer.init_state()
    it = BatchIterator(ds, cfg.batch_size, seed=0)

    losses = []
    for _ in range(12):
        batch = trainer.shard_batch(next(it))
        state, metrics = trainer.train_step(state, batch)
        losses.append(float(metrics.loss))
        assert bool(metrics.finite)
    it.close()
    assert np.isfinite(losses).all()
    # learning signal: later losses beat the start on the same tiny pool
    assert min(losses[6:]) < losses[0], losses


def test_fit_loop_with_validation(ds):
    cfg = tiny_cfg(epochs=2)
    trainer = Trainer(cfg, steps_per_epoch=2, mesh=mesh1())
    state = trainer.init_state()
    it = BatchIterator(ds, cfg.batch_size, seed=1)
    rankings = pregenerate_val_rankings(
        ds.take(8),
        sampler_name="thresholded",
        rankings_per_image=cfg.rankings_per_image,
        ranking_size=cfg.ranking_size,
    )

    def vfac():
        return val_batches(ds.take(8), rankings, cfg.batch_size)

    state, history = trainer.fit(state, it, val_iter_factory=vfac)
    it.close()
    assert len(history["loss"]) == 2
    assert len(history["val_loss"]) == 2
    assert np.isfinite(history["val_loss"]).all()
    assert int(jax.device_get(state.step)) == 4


def test_frozen_encoder_params_do_not_move(ds):
    cfg = tiny_cfg(freeze_encoder=True)
    trainer = Trainer(cfg, steps_per_epoch=1, mesh=mesh1())
    state = trainer.init_state()
    before = jax.device_get(
        state.params["encoder"]["stem_conv"]["kernel"]
    )
    it = BatchIterator(ds, cfg.batch_size, seed=2)
    for _ in range(2):
        state, _ = trainer.train_step(state, trainer.shard_batch(next(it)))
    it.close()
    after = jax.device_get(state.params["encoder"]["stem_conv"]["kernel"])
    np.testing.assert_array_equal(before, after)
    # BN affine in encoder must still train
    bn_before = jax.device_get(
        trainer.init_state().params["encoder"]["stem_bn"]["scale"]
    )
    bn_after = jax.device_get(state.params["encoder"]["stem_bn"]["scale"])
    assert not np.allclose(bn_before, bn_after)


def test_batch_is_sharded_over_data_axis(ds):
    cfg = tiny_cfg()
    trainer = Trainer(cfg, steps_per_epoch=1)
    it = BatchIterator(ds, cfg.batch_size, seed=0)
    batch = trainer.shard_batch(next(it))
    it.close()
    sharding = batch["image"].sharding
    assert sharding.is_fully_replicated is False
    # each of the 8 devices holds exactly 1 of the 8 samples
    shard_shapes = {s.data.shape for s in batch["image"].addressable_shards}
    assert shard_shapes == {(1, S, S, 3)}


def test_determinism_same_seed_same_first_loss(ds):
    cfg = tiny_cfg(augmentation=False)
    m = mesh1()
    t1 = Trainer(cfg, steps_per_epoch=1, mesh=m)
    t2 = Trainer(cfg, steps_per_epoch=1, mesh=m)
    it = BatchIterator(ds, cfg.batch_size, seed=0, shuffle=False)
    batch = next(it)
    it.close()
    s1, m1 = t1.train_step(t1.init_state(), t1.shard_batch(batch))
    s2, m2 = t2.train_step(t2.init_state(), t2.shard_batch(batch))
    assert float(m1.loss) == float(m2.loss)


def test_training_improves_ordinal_error(ds):
    """Accuracy smoke (SURVEY.md §4 item 5 beyond loss): overfitting the
    tiny pool must improve the reference ordinal-error METRIC, not just the
    ListMLE loss — ties the train loop to the eval stack end-to-end."""
    from pldepth_tpu.eval.evaluator import Evaluator

    cfg = tiny_cfg(initial_lr=1e-3)
    trainer = Trainer(cfg, steps_per_epoch=2, mesh=mesh1())
    state = trainer.init_state()

    pool = ds.take(8)
    err0 = Evaluator(trainer, state, eval_batch_size=8).calc_err(pool)

    it = BatchIterator(ds, cfg.batch_size, seed=2)
    for _ in range(30):
        state, metrics = trainer.train_step(state, trainer.shard_batch(next(it)))
        assert bool(metrics.finite)
    it.close()

    err1 = Evaluator(trainer, state, eval_batch_size=8).calc_err(pool)
    # random init starts near chance (~0.5); a real learning signal must
    # beat it decisively on the training pool itself
    assert err1 < err0 - 0.05, (err0, err1)
