"""Flax -> Keras reverse export (models/convert.py export_npz_to_keras*):
the name maps were designed invertible; these tests prove it by
round-tripping — convert a Keras model to npz, export the npz into a fresh
Keras graph, convert again, and compare bitwise. This is what lets
reference-side tooling (test_data_eval.py:70-85) evaluate TPU-trained
models where the real data lives."""

import json
import os
import sys

import numpy as np
import pytest

pytestmark = pytest.mark.slow

S = 64

TOOLS = os.path.join(os.path.dirname(__file__), "..", "tools")


def _invoke(args):
    from click.testing import CliRunner

    from pldepth_tpu.cli import cli

    res = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert res.exit_code == 0, res.output
    return res.output


def test_backbone_roundtrip_bitwise_cli(tmp_path):
    """convert -> (train 0 steps: load into a Flax state, save the full
    state npz) -> convert --reverse -> convert again == original, bitwise,
    on every encoder tensor."""
    tf = pytest.importorskip("tensorflow")

    h5 = str(tmp_path / "b0.h5")
    tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_shape=(S, S, 3)
    ).save(h5)
    npz1 = str(tmp_path / "enc.npz")
    _invoke(["convert", "--weights", h5, "--model_name", "ff_effnet",
             "--out", npz1])

    # "train 0 steps": build a real TrainState with the converted encoder,
    # then snapshot the full state the way a training run would
    import jax

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import save_weights_npz

    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=S, batch_size=4, ranking_size=3,
        rankings_per_image=4, compute_dtype="float32", listmle_impl="xla",
        pretrained_path=npz1,
    )
    trainer = Trainer(cfg, steps_per_epoch=1,
                      mesh=make_mesh(devices=jax.devices()[:1]))
    state = trainer.init_state()
    trained_npz = str(tmp_path / "weights.npz")
    save_weights_npz(trained_npz, state)

    h5_back = str(tmp_path / "b0_back.h5")
    out = json.loads(_invoke([
        "convert", "--reverse", "--weights", trained_npz,
        "--model_name", "ff_effnet", "--out", h5_back,
        "--input_size", str(S),
    ]))
    assert out["tensors_assigned"] > 200  # B0 encoder tensor count

    npz2 = str(tmp_path / "enc2.npz")
    _invoke(["convert", "--weights", h5_back, "--model_name", "ff_effnet",
             "--out", npz2])
    a, b = np.load(npz1), np.load(npz2)
    assert set(a.files) == set(b.files)
    for k in a.files:
        np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def _roundtrip_inmemory(model_name):
    """Build the actual reference graph twice; push arrays through
    collect -> export -> collect and compare bitwise."""
    pytest.importorskip("tensorflow")
    sys.path.insert(0, TOOLS)
    try:
        import ref_models
    finally:
        sys.path.remove(TOOLS)

    from pldepth_tpu.models.convert import (
        collect_full_model,
        entries_to_arrays,
        export_npz_to_keras,
    )

    src, _pre = ref_models.build_reference_model(model_name, S)
    arrays = entries_to_arrays(collect_full_model(src, model_name))
    dst, _pre = ref_models.build_reference_model(model_name, S)
    key = "params/encoder/stem_conv/kernel"
    before = entries_to_arrays(collect_full_model(dst, model_name))[key].copy()
    n = export_npz_to_keras(dst, model_name, arrays, strict=True)
    assert n == len(arrays)
    back = entries_to_arrays(collect_full_model(dst, model_name))
    # the export really assigned (fresh builds start from different inits)
    assert not np.array_equal(back[key], before)
    assert set(back) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(arrays[k], back[k], err_msg=k)


def test_full_model_roundtrip_effnet_inmemory():
    _roundtrip_inmemory("ff_effnet")


def test_full_model_roundtrip_redweb_inmemory():
    _roundtrip_inmemory("ff_redweb")


def test_full_model_template_roundtrip_cli(tmp_path):
    """File-level template path: a reference-architecture .h5 is filled
    from a weights npz and re-converted bitwise. The reference's own
    full-model loads need the custom model class registered
    (run_scripts/rnd_on_info_pretrain.py:98-99 passes custom_objects);
    CliRunner is in-process, so a surrounding custom_object_scope gives
    the CLI the same environment a reference-side user has."""
    tf = pytest.importorskip("tensorflow")
    sys.path.insert(0, TOOLS)
    try:
        import ref_models
    finally:
        sys.path.remove(TOOLS)

    from pldepth_tpu.models.convert import (
        collect_full_model,
        entries_to_arrays,
    )

    model, _pre = ref_models.build_reference_model("ff_effnet", S)

    # The reference subclass (pl_hourglass.py:10-19) predates Keras 3 and
    # its h5 save doesn't deserialize on a modern stack (no functional
    # topology in the subclass config). Re-wrapping as a plain functional
    # Model keeps every layer name/structure the collectors key on and
    # h5-round-trips — the recipe docs/PARITY.md gives template authors.
    plain = tf.keras.Model(model.inputs, model.outputs)
    template = str(tmp_path / "ref_effnet.h5")
    plain.save(template)
    arrays = entries_to_arrays(collect_full_model(plain, "ff_effnet"))
    npz = str(tmp_path / "weights.npz")
    np.savez(npz, **arrays)

    h5_out = str(tmp_path / "exported.h5")
    out = json.loads(_invoke([
        "convert", "--reverse", "--weights", npz, "--model_name",
        "ff_effnet", "--out", h5_out, "--template", template,
    ]))
    assert out["tensors_assigned"] == len(arrays)

    npz2 = str(tmp_path / "weights2.npz")
    _invoke(["convert", "--weights", h5_out, "--model_name",
             "ff_effnet", "--out", npz2])
    b = np.load(npz2)
    assert set(b.files) == set(arrays)
    for k in arrays:
        np.testing.assert_array_equal(arrays[k], b[k], err_msg=k)


def test_reverse_export_strict_missing_raises(tmp_path):
    pytest.importorskip("tensorflow")
    import tensorflow as tf

    from pldepth_tpu.models.convert import export_npz_to_keras

    m = tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_shape=(S, S, 3)
    )
    with pytest.raises(ValueError, match="no "):
        export_npz_to_keras(m, "ff_effnet", {"params/bogus": np.zeros(3)},
                            strict=True)
