"""AOT serving export (serve/export.py): round-trip parity and CLI."""

import jax
import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.serve import export_predict, load_exported
from pldepth_tpu.train import Trainer


@pytest.fixture(scope="module")
def setup():
    cfg = ExperimentConfig(model_name="ff_smoke", input_size=64, batch_size=2)
    tr = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))
    state = tr.init_state()
    # the artifact contract is [0,1]-ranged float images (meta.input_range)
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(7), (2, 64, 64, 3)), np.float32
    )
    return tr, state, imgs


def test_export_roundtrip_matches_predict(setup, tmp_path):
    tr, state, imgs = setup
    path = str(tmp_path / "model.plx")
    export_predict(tr, state, batch_size=2, path=path, platforms=("cpu",))
    call, meta = load_exported(path)
    assert meta["model_name"] == "ff_smoke"
    assert meta["input_size"] == 64
    assert meta["input_range"] == "[0,1]"
    a = np.asarray(call(imgs), np.float32)
    b = np.asarray(jax.jit(tr.predict)(state, imgs), np.float32)
    assert a.shape == (2, 64, 64)
    # bf16 interior: compiled-anew StableHLO vs the jit graph differ by
    # fusion-order rounding only
    rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
    assert rel < 0.03, rel


def test_export_batch_polymorphic(setup, tmp_path):
    """batch_size=0 exports a symbolic leading dim: one artifact, any
    batch at call time."""
    tr, state, imgs = setup
    path = str(tmp_path / "poly.plx")
    export_predict(tr, state, batch_size=0, path=path, platforms=("cpu",))
    call, meta = load_exported(path)
    assert meta["batch_size"] is None
    for n in (1, 2, 3):
        batch = np.broadcast_to(imgs[:1], (n, 64, 64, 3)).copy()
        out = np.asarray(call(batch), np.float32)
        assert out.shape == (n, 64, 64) and np.isfinite(out).all()
    ref = np.asarray(jax.jit(tr.predict)(state, imgs), np.float32)
    got = np.asarray(call(imgs), np.float32)
    rel = np.abs(got - ref).max() / max(np.abs(ref).max(), 1e-9)
    assert rel < 0.03, rel


def test_export_multi_platform_lowering(setup, tmp_path):
    """tpu+cpu lowering must serialize (the portable default)."""
    tr, state, _ = setup
    path = str(tmp_path / "multi.plx")
    export_predict(tr, state, batch_size=2, path=path,
                   platforms=("tpu", "cpu"))
    _, meta = load_exported(path)
    assert set(meta["platforms"]) == {"tpu", "cpu"}


def test_cli_export(setup, tmp_path):
    from click.testing import CliRunner

    from pldepth_tpu.cli import cli
    from pldepth_tpu.train.checkpoint import save_weights_npz

    tr, state, imgs = setup
    wpath = str(tmp_path / "w.npz")
    save_weights_npz(wpath, state)
    out = str(tmp_path / "m.plx")
    res = CliRunner().invoke(
        cli,
        ["export", "--model_name", "ff_smoke", "--input_size", "64",
         "--batch_size", "2", "--platforms", "cpu",
         "--load_model_path", wpath, "--out", out],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    call, _ = load_exported(out)
    pred = np.asarray(call(imgs), np.float32)
    assert pred.shape == (2, 64, 64) and np.isfinite(pred).all()
