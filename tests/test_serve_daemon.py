"""serve/daemon.py: backlog pass, size-stability gate, CLI wiring."""

import json
import os

import numpy as np
import pytest
from PIL import Image

from pldepth_tpu.serve.daemon import serve_directory


def _put_images(d, names, size=8):
    os.makedirs(d, exist_ok=True)
    rng = np.random.default_rng(0)
    for n in names:
        Image.fromarray(rng.integers(0, 255, (size, size, 3), np.uint8)).save(
            os.path.join(d, n)
        )


def _mean_infer(imgs):
    return np.asarray(imgs, np.float32).mean(axis=-1)


def test_once_processes_backlog(tmp_path):
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, [f"a{i}.png" for i in range(5)])
    n = serve_directory(
        watch, out, _mean_infer, input_size=8, batch_size=2, once=True
    )
    assert n == 5
    outs = sorted(os.listdir(out))
    assert outs == [f"a{i}_depth.npy" for i in range(5)]
    assert np.load(os.path.join(out, "a0_depth.npy")).shape == (8, 8)


def test_once_skips_already_served(tmp_path):
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, ["a.png", "b.png"])
    assert serve_directory(watch, out, _mean_infer, 8, 2, once=True) == 2
    _put_images(watch, ["c.png"])
    # second pass: only the new file
    assert serve_directory(watch, out, _mean_infer, 8, 2, once=True) == 1


def test_size_stability_gate(tmp_path):
    """Watch mode: a file seen for the first time is NOT dispatched until a
    second poll confirms its size is stable (no half-written uploads)."""
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, ["a.png"])
    n1 = serve_directory(
        watch, out, _mean_infer, 8, 2, once=False, max_polls=1,
        poll_interval=0.01,
    )
    assert n1 == 0 and not os.listdir(out)
    n2 = serve_directory(
        watch, out, _mean_infer, 8, 2, once=False, max_polls=2,
        poll_interval=0.01,
    )
    assert n2 == 1 and os.listdir(out) == ["a_depth.npy"]


def test_pad_batch_applied_to_tail(tmp_path):
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, ["a.png", "b.png", "c.png"])
    seen_shapes = []

    def infer(imgs):
        seen_shapes.append(imgs.shape)
        return _mean_infer(imgs)

    pad = lambda a: (
        np.concatenate([a, np.zeros((2 - len(a), *a.shape[1:]), a.dtype)])
        if len(a) < 2 else a
    )
    n = serve_directory(
        watch, out, infer, 8, 2, pad_batch=pad, once=True
    )
    assert n == 3
    assert all(s == (2, 8, 8, 3) for s in seen_shapes)
    assert len(sorted(out_f for out_f in os.listdir(out))) == 3


def test_poison_file_quarantined_others_served(tmp_path):
    """A corrupt image must not kill the daemon or starve the rest of the
    backlog: good files serve, the bad one is quarantined and logged."""
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, ["a.png", "c.png"])
    with open(os.path.join(watch, "b.png"), "wb") as f:
        f.write(b"not a png at all")
    n = serve_directory(
        watch, out, _mean_infer, 8, 4, once=True, poll_interval=0.01
    )
    assert n == 2
    assert sorted(os.listdir(out)) == ["a_depth.npy", "c_depth.npy"]


def test_stem_collision_gets_extension_qualified_outputs(tmp_path):
    """a.jpg + a.png must not race onto one a_depth.npy."""
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, ["a.jpg", "a.png", "b.png"])
    n = serve_directory(
        watch, out, _mean_infer, 8, 4, once=True, poll_interval=0.01
    )
    assert n == 3
    assert sorted(os.listdir(out)) == [
        "a_jpg_depth.npy", "a_png_depth.npy", "b_depth.npy",
    ]


def test_cli_serve_once_with_weights(tmp_path):
    """End-to-end `cli serve --once` from a weights checkpoint on the
    virtual mesh (sharded forward, batch rounded to the data axis)."""
    import jax
    from click.testing import CliRunner

    from pldepth_tpu.cli import cli
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import save_weights_npz

    cfg = ExperimentConfig(model_name="ff_smoke", input_size=64, batch_size=8)
    tr = Trainer(cfg, steps_per_epoch=1)
    wpath = str(tmp_path / "w.npz")
    save_weights_npz(wpath, tr.init_state())
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, ["x.png", "y.png", "z.png"], size=64)
    res = CliRunner().invoke(
        cli,
        ["serve", "--model_name", "ff_smoke", "--input_size", "64",
         "--batch_size", "3", "--load_model_path", wpath,
         "--watch_dir", watch, "--out_dir", out, "--once", "true"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    payload = json.loads(res.output[res.output.index("{"):])
    assert payload["processed"] == 3
    d = np.load(os.path.join(out, "x_depth.npy"))
    assert d.shape == (64, 64) and np.isfinite(d).all()


def test_cli_serve_once_from_artifact(tmp_path):
    """`cli serve --artifact`: AOT source, no model code at serving time;
    a batch-polymorphic artifact handles the odd tail batch unpadded."""
    import jax
    from click.testing import CliRunner

    from pldepth_tpu.cli import cli
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.serve import export_predict
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(model_name="ff_smoke", input_size=64, batch_size=2)
    tr = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))
    apath = str(tmp_path / "m.plx")
    export_predict(tr, tr.init_state(), batch_size=0, path=apath,
                   platforms=("cpu",))
    watch, out = str(tmp_path / "in"), str(tmp_path / "out")
    _put_images(watch, ["p.png", "q.png", "r.png"], size=64)
    res = CliRunner().invoke(
        cli,
        ["serve", "--artifact", apath, "--batch_size", "2",
         "--watch_dir", watch, "--out_dir", out, "--once", "true"],
        catch_exceptions=False,
    )
    assert res.exit_code == 0, res.output
    payload = json.loads(res.output[res.output.index("{"):])
    assert payload["processed"] == 3
    assert np.load(os.path.join(out, "r_depth.npy")).shape == (64, 64)


def test_cli_serve_rejects_ambiguous_source(tmp_path):
    from click.testing import CliRunner

    from pldepth_tpu.cli import cli

    res = CliRunner().invoke(
        cli,
        ["serve", "--watch_dir", str(tmp_path), "--out_dir", str(tmp_path)],
    )
    assert res.exit_code != 0
    assert "exactly one of" in res.output
