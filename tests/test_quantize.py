"""int8 post-training quantization for serving (models/quantize.py).

The reference has no quantized path; this is a TPU-native serving mode
(int8 MXU rate ~2x bf16; measured +7% serving over the bn_fold default at
448^2, docs/BENCH.md). Tests run the full prepare->serve flow on ff_smoke.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
from pldepth_tpu.train import Trainer


@pytest.fixture(scope="module")
def quant_setup():
    cfg = ExperimentConfig(
        model_name="ff_smoke", input_size=64, batch_size=4, ranking_size=3,
        rankings_per_image=4, sampling_type=1,
    )
    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=8, image_size=64, seed=0)
    it = BatchIterator(ds, 4, seed=0)
    batch = next(it)
    it.close()
    qvars = trainer.prepare_quant(state, batch["image"])
    return trainer, state, batch, qvars


def test_quant_matches_float_serving(quant_setup):
    """int8 serving tracks the bn_fold float graph closely even on a
    random-init model (the PTQ worst case: uncalibrated activations)."""
    trainer, state, batch, qvars = quant_setup
    p_ref = np.asarray(
        jax.device_get(trainer.predict_bnfold(state, batch["image"])),
        np.float32,
    )
    p_q = np.asarray(
        jax.device_get(trainer.predict_quant(qvars, batch["image"])),
        np.float32,
    )
    assert np.isfinite(p_q).all()
    rel = np.abs(p_q - p_ref).max() / max(np.abs(p_ref).max(), 1e-9)
    corr = np.corrcoef(p_q.ravel(), p_ref.ravel())[0, 1]
    assert rel < 0.15, f"int8 deviates: max rel {rel}"
    assert corr > 0.98, f"int8 decorrelates: pearson {corr}"


def test_quant_params_are_int8_with_calibrated_scales(quant_setup):
    trainer, state, batch, qvars = quant_setup
    leaves = jax.tree_util.tree_leaves_with_path(qvars["params"])
    kinds = {"kernel_q": 0, "a_scale": 0}
    for path, leaf in leaves:
        name = getattr(path[-1], "key", str(path[-1]))
        if name == "kernel_q":
            kinds["kernel_q"] += 1
            assert leaf.dtype == jnp.int8
            assert int(jnp.abs(leaf.astype(jnp.int32)).max()) <= 127
        if name == "a_scale":
            kinds["a_scale"] += 1
            # ones = uncalibrated init; calibration must have replaced it
            assert float(leaf) > 0
            assert float(leaf) != 1.0
    # stem + top + per-block convs + decoder convs all quantized
    assert kinds["kernel_q"] >= 15
    assert kinds["a_scale"] == kinds["kernel_q"]


def test_quant_serving_over_mesh(quant_setup):
    """jit_predict('quant'): the packed variables ride the replicated spec,
    images shard over the data axis (same contract as the other modes)."""
    trainer, state, batch, qvars = quant_setup
    pred = trainer.jit_predict(fused="quant")(qvars, batch["image"])
    p_q = np.asarray(jax.device_get(pred), np.float32)
    assert p_q.shape == (4, 64, 64)
    assert np.isfinite(p_q).all()


def test_quant_rejects_non_effnet():
    cfg = ExperimentConfig(
        model_name="ff_redweb", input_size=64, batch_size=2, ranking_size=3,
        rankings_per_image=4, sampling_type=1,
    )
    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    with pytest.raises(NotImplementedError):
        trainer.prepare_quant(
            trainer.init_state(), np.zeros((2, 64, 64, 3), np.float32)
        )
