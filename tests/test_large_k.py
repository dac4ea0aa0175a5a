"""Large-K scaling: the sweep space the reference explored goes to
ranking_size=500 (pldepth/hyperopt/hyperparams.py:44). Round-3 had only a
kernel bench at K=500; these tests gate the FULL train step at K=100/500
and the draw-method auto-selection that makes it fit (hier's ~1 KB/point
gather row would be 256 MB/image at K=500, RPI=100, oversample x5 —
samplers.resolve_draw_method switches to packed above 32k points/image).
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
from pldepth_tpu.sampling.samplers import (
    _HIER_AUTO_MAX_POINTS,
    _masked_uniform_points,
    resolve_draw_method,
    sample_rankings,
)
from pldepth_tpu.train import Trainer

S = 64


def test_auto_resolves_by_point_count():
    assert resolve_draw_method("auto", 2500) == "hier"  # headline K=5
    assert resolve_draw_method("auto", _HIER_AUTO_MAX_POINTS) == "hier"
    assert resolve_draw_method("auto", _HIER_AUTO_MAX_POINTS + 1) == "packed"
    assert resolve_draw_method("auto", 250_000) == "packed"  # K=500 extreme
    # explicit choices pass through untouched
    for m in ("hier", "packed", "compact", "rejection"):
        assert resolve_draw_method(m, 250_000) == m


def test_hier_and_packed_draws_bit_identical():
    """The auto switch must not change sampling semantics: hier and packed
    compute the same "g-th valid pixel" draw for the same key."""
    key = jax.random.key(42)
    mask = (jax.random.uniform(jax.random.key(1), (S * S,)) > 0.4).astype(
        jnp.float32
    )
    a = _masked_uniform_points(key, mask, 4096, "hier")
    b = _masked_uniform_points(key, mask, 4096, "packed")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def _step_cfg(k, rpi):
    return ExperimentConfig(
        model_name="ff_smoke",
        input_size=S,
        batch_size=2,
        ranking_size=k,
        rankings_per_image=rpi,
        sampling_type=1,  # info-score, oversample x5
        epochs=1,
        initial_lr=3e-4,
        compute_dtype="float32",
        listmle_impl="xla",
    )


@pytest.mark.slow
@pytest.mark.parametrize(
    "k,rpi",
    [
        (100, 16),  # 80 cand * 100 = 8k points/img: hier regime
        (500, 14),  # 70 cand * 500 = 35k points/img: auto switches to packed
    ],
)
def test_full_train_step_large_k(k, rpi):
    cfg = _step_cfg(k, rpi)
    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=4, image_size=S, seed=5)
    it = BatchIterator(ds, cfg.batch_size, seed=0)
    losses = []
    for _ in range(2):
        state, metrics = trainer.train_step(state, trainer.shard_batch(next(it)))
        losses.append(float(metrics.loss))
        assert bool(metrics.finite)
    it.close()
    assert np.isfinite(losses).all(), losses
    # ListMLE NLL grows ~K log K; just require a sane positive magnitude
    assert 0.0 < losses[0] < 20.0 * k
