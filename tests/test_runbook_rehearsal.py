"""Turnkey parity-runbook rehearsal on a fake HR-WSI tree.

docs/PARITY.md documents the exact commands a real-data user types
(convert -> train --parity_report -> eval -> zeroshot); until round 4
nobody had ever *executed* that path — every CI run used synthetic data
and random init. This module builds tiny datasets in the exact on-disk
layouts of the real ones and runs the runbook commands end-to-end through
the CLI, so only dataset *scale* (and the paper's WHDR value) remains
unrehearsed:

* HR-WSI: ``{split}/imgs/*.jpg`` + path-substituted ``gts/*.png`` and
  ``valid_masks/*.png`` (reference pldepth/data/dao/hr_wsi.py:55-63)
* Ibims: ``*.mat`` data struct, image field 2 / depth field 3
  (ibims.py:19-22); DIODE: nested png + ``*_depth.npy`` (diode.py:9-44);
  Sintel: ``images/<scene>/*.png`` + ``depth_viz`` substitution
  (sintel.py:7-45); TUM: ``*.h5`` with gt/img_1 + gt/pp_depth
  (tum.py:27-31)
* Backbone conversion runs on a real Keras EfficientNetB0 graph
  (weights=None: ImageNet download is impossible offline; the *mapping*
  is what's rehearsed — numerics are covered by
  tools/keras_parity_check.py)
"""

import json
import os

import numpy as np
import pytest
from click.testing import CliRunner

pytestmark = pytest.mark.slow

S = 64  # rehearsal input size (the runbook's 448 only changes scale)
# >= 15: the runbook's train/val split is ds_size//15 (reference
# PLDepth.py:142-147) — fewer images leaves an empty val split and the
# post-train eval + parity report are skipped
N_IMGS = 16


def _invoke(args):
    from pldepth_tpu.cli import cli

    res = CliRunner().invoke(cli, args, catch_exceptions=False)
    assert res.exit_code == 0, res.output
    return res.output


def _write_png(path, arr_u8):
    from PIL import Image

    Image.fromarray(arr_u8).save(path)


@pytest.fixture(scope="module")
def fake_hrwsi(tmp_path_factory):
    """HR-WSI layout: {train,val,test-ish}/imgs|gts|valid_masks."""
    root = tmp_path_factory.mktemp("hrwsi")
    rng = np.random.default_rng(0)
    for split in ("train", "val"):
        for sub in ("imgs", "gts", "valid_masks"):
            os.makedirs(root / split / sub)
        for i in range(N_IMGS):
            img = rng.integers(0, 255, (72, 96, 3), np.uint8)
            # piecewise-planar depth so rankings carry learnable signal
            yy, xx = np.mgrid[0:72, 0:96].astype(np.float32)
            gt = (yy / 72 + xx / 96) / 2 + rng.uniform(0, 0.3)
            mask = np.full((72, 96), 255, np.uint8)
            mask[:4, :4] = 0  # a masked-out corner
            from PIL import Image

            Image.fromarray(img).save(root / split / "imgs" / f"{i:05d}.jpg")
            _write_png(root / split / "gts" / f"{i:05d}.png",
                       (gt * 255).astype(np.uint8))
            _write_png(root / split / "valid_masks" / f"{i:05d}.png", mask)
    return root


@pytest.fixture(scope="module")
def zeroshot_roots(tmp_path_factory):
    """One tiny sample per zero-shot dataset, real file formats."""
    import h5py
    from scipy import io as sio

    rng = np.random.default_rng(1)
    base = tmp_path_factory.mktemp("zeroshot")
    img = rng.integers(0, 255, (48, 64, 3), np.uint8)
    depth = rng.uniform(0.5, 5.0, (48, 64)).astype(np.float32)

    ibims = base / "ibims"
    os.makedirs(ibims)
    # reference struct: data[0][0][field] with image at 2, depth at 3
    rec = np.zeros((1, 1), dtype=[("a", "O"), ("b", "O"),
                                  ("rgb", "O"), ("depth", "O")])
    rec[0, 0] = (np.zeros(1), np.zeros(1), img.astype(np.float32), depth)
    sio.savemat(ibims / "scene0.mat", {"data": rec})

    diode = base / "diode"
    scan = diode / "val" / "indoors" / "scene_00019"
    os.makedirs(scan)
    _write_png(scan / "00019_00183.png", img)
    np.save(scan / "00019_00183_depth.npy", depth[..., None])

    sintel = base / "sintel"
    os.makedirs(sintel / "images" / "alley_1")
    os.makedirs(sintel / "depth_viz" / "alley_1")
    _write_png(sintel / "images" / "alley_1" / "frame_0001.png", img)
    _write_png(sintel / "depth_viz" / "alley_1" / "frame_0001.png",
               (depth / depth.max() * 255).astype(np.uint8))

    tum = base / "tum"
    os.makedirs(tum)
    with h5py.File(tum / "seq0.h5", "w") as f:
        g = f.create_group("gt")
        g.create_dataset("img_1", data=img.astype(np.float32))
        g.create_dataset("pp_depth", data=depth)
    return {"ibims": ibims, "diode": diode, "sintel": sintel, "tum": tum}


@pytest.fixture(scope="module")
def backbone_npz(tmp_path_factory):
    """Runbook step 1: cli convert on a real Keras EfficientNetB0 file."""
    tf = pytest.importorskip("tensorflow")
    out_dir = tmp_path_factory.mktemp("convert")
    h5 = str(out_dir / "effnet_b0_raw.h5")
    # weights=None: offline. The reference builds exactly this graph
    # (pl_hourglass.py:48) with ImageNet weights; conversion only reads
    # layer structure + tensors, which are identical either way.
    model = tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_shape=(S, S, 3)
    )
    model.save(h5)
    npz = str(out_dir / "effnet_b0.npz")
    out = _invoke(["convert", "--weights", h5,
                   "--model_name", "ff_effnet", "--out", npz])
    assert json.loads(out)["out"] == npz
    return npz


def test_runbook_config1_end_to_end(fake_hrwsi, zeroshot_roots, backbone_npz,
                                    tmp_path):
    """docs/PARITY.md config #1, verbatim flags at rehearsal scale."""
    out = _invoke([
        "train",
        "--model_name", "ff_effnet",
        "--dataset", "HR-WSI", "--data_root", str(fake_hrwsi),
        "--input_size", str(S), "--batch_size", "8",  # runbook uses 4; CI mesh has 8 devices
        "--ranking_size", "5", "--rankings_per_image", "16",
        "--epochs", "2", "--sampling_type", "0",
        "--schedule", "sgdr", "--initial_lr", "1e-3",
        "--pretrained_path", backbone_npz,
        "--data_resident", "true",
        "--parity_report", "true", "--parity_target_whdr", "0.95",
        "--compute_dtype", "float32",
        "--output_dir", str(tmp_path), "--run_name", "parity_c1",
    ])
    run_dir = tmp_path / "parity_c1"
    report = json.loads((run_dir / "parity_report.json").read_text())
    for key in ("test_error", "whdr_tau_0.03", "ndcg_200"):
        assert key in report, report
    assert report["parity"]["target_whdr"] == 0.95
    assert (run_dir / "weights.npz").exists()
    assert "PARITY" in out

    weights = str(run_dir / "weights.npz")

    # runbook step 3: test-set evaluation on the HR-WSI layout
    ev = json.loads(_invoke([
        "eval", "--model_name", "ff_effnet",
        "--load_model_path", weights,
        "--dataset", "HR-WSI", "--data_root", str(fake_hrwsi),
        "--input_size", str(S), "--limit", "8",
    ]))
    assert 0.0 <= ev["test_error"] <= 1.0
    assert "whdr_tau_0.03" in ev

    # runbook step 4: zero-shot suite over all four eval DAOs
    zs = json.loads(_invoke([
        "zeroshot", "--model_name", "ff_effnet",
        "--load_model_path", weights, "--input_size", str(S),
        "--ibims_root", str(zeroshot_roots["ibims"]),
        "--diode_root", str(zeroshot_roots["diode"]),
        "--sintel_root", str(zeroshot_roots["sintel"]),
        "--tum_root", str(zeroshot_roots["tum"]),
    ]))
    assert set(zs) >= {"ibims", "diode", "sintel", "tum"}
    for name, row in zs.items():
        err = row["ordinal_error"] if isinstance(row, dict) else row
        assert 0.0 <= err <= 1.0, (name, row)
