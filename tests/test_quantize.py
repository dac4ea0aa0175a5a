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


@pytest.mark.slow
def test_quant_redweb_family():
    """int8 serving covers ff_redweb too (ResNet-50 + ReDWeb decoder; the
    Keras-v1 eps 1.001e-5 fold path, biased convs, 7x7 explicit-pad stem).
    slow: three ResNet-50 graph compiles on this 1-core host."""
    cfg = ExperimentConfig(
        model_name="ff_redweb", input_size=64, batch_size=2, ranking_size=3,
        rankings_per_image=4, sampling_type=1,
    )
    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state = trainer.init_state()
    rng = np.random.default_rng(0)
    imgs = rng.random((2, 64, 64, 3), np.float32)
    qvars = trainer.prepare_quant(state, imgs)
    p_ref = np.asarray(
        jax.device_get(trainer.predict_bnfold(state, imgs)), np.float32
    )
    p_q = np.asarray(
        jax.device_get(trainer.predict_quant(qvars, imgs)), np.float32
    )
    assert np.isfinite(p_q).all()
    corr = np.corrcoef(p_q.ravel(), p_ref.ravel())[0, 1]
    assert corr > 0.98, f"int8 redweb decorrelates: pearson {corr}"


def test_quant_matmul_kernel_exact():
    """ops/quant_matmul.py (interpret mode): matches the int32-accumulate
    reference to <=1 LSB of the f32 epilogue."""
    import jax.numpy as jnp

    from pldepth_tpu.ops.quant_matmul import pick_tile_m, quant_matmul

    rng = np.random.default_rng(0)
    m, k, n = 96, 256, 136
    x = jnp.asarray(rng.integers(-127, 128, (m, k)), jnp.int8)
    w = jnp.asarray(rng.integers(-127, 128, (k, n)), jnp.int8)
    ws = jnp.asarray(rng.random(n) * 0.01 + 1e-3, jnp.float32)
    b = jnp.asarray(rng.standard_normal(n) * 0.01, jnp.float32)
    a = jnp.float32(0.05)
    got = np.asarray(
        quant_matmul(x, w, ws, b, a, act="swish", out_dtype=jnp.float32,
                     interpret=True),
        np.float32,
    )
    acc = np.asarray(x, np.int32) @ np.asarray(w, np.int32)
    ref = acc.astype(np.float32) * (np.asarray(ws) * 0.05) + np.asarray(b)
    ref = ref / (1.0 + np.exp(-ref))
    np.testing.assert_allclose(got, ref, rtol=1e-5, atol=1e-5)
    assert pick_tile_m(m) == 96 and pick_tile_m(401408) == 1024
    assert pick_tile_m(97) is None


def test_cli_predict_quantize_int8(tmp_path):
    """`cli predict --quantize int8`: calibrates on the first chunk and
    writes depth maps through the int8 serving graph."""
    import os

    from click.testing import CliRunner
    from PIL import Image

    from pldepth_tpu.cli import cli
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import save_weights_npz

    cfg = ExperimentConfig(model_name="ff_smoke", input_size=64)
    tr = Trainer(cfg, steps_per_epoch=1,
                 mesh=make_mesh(devices=jax.devices()[:1]))
    wpath = str(tmp_path / "w.npz")
    save_weights_npz(wpath, tr.init_state())
    img_dir = tmp_path / "imgs"
    img_dir.mkdir()
    rng = np.random.default_rng(0)
    for name in ("a", "b"):
        Image.fromarray(
            rng.integers(0, 255, (64, 64, 3), np.uint8)
        ).save(img_dir / f"{name}.png")
    out_dir = str(tmp_path / "out")
    res = CliRunner().invoke(
        cli,
        ["predict", "--model_name", "ff_smoke", "--input_size", "64",
         "--load_model_path", wpath, "--inputs", str(img_dir),
         "--out_dir", out_dir, "--batch_size", "2", "--quantize", "int8"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    for name in ("a", "b"):
        d = np.load(os.path.join(out_dir, f"{name}_depth.npy"))
        assert d.shape == (64, 64) and np.isfinite(d).all()
