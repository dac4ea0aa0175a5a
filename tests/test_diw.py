"""DIW zero-shot path (data/diw.py + eval/diw.py + cli zeroshot --diw_root).

The reference names DIW in its zero-shot story but ships no DIW DAO
(pldepth/data/dao/dao_meta.py:9-22); these tests are the executable spec of
the conventions our implementation documents: official csv layout,
1-indexed coordinates, ``>`` = point A farther, model outputs descending
(larger = closer)."""

import json
import os

import numpy as np
import pytest

from pldepth_tpu.data.diw import load_diw
from pldepth_tpu.eval.diw import evaluate_diw


def _write_jpg(path, arr_u8):
    from PIL import Image

    os.makedirs(os.path.dirname(path), exist_ok=True)
    Image.fromarray(arr_u8).save(path, quality=95)


def _fake_tree(root, n_images=3, size=(40, 60)):
    """Official DIW layout: DIW_test.csv + relative image paths."""
    h, w = size
    lines = []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        img = rng.integers(0, 255, (h, w, 3), np.uint8)
        rel_path = f"DIW_test/{i:03d}.jpg"
        _write_jpg(os.path.join(root, rel_path), img)
        lines.append("/" + rel_path)
        # 1-indexed coords, one pair per image (the DIW norm); rel
        # alternates; trailing w,h as the official dumps carry
        ya, xa, yb, xb = 5, 7, 30, 50
        rel = ">" if i % 2 == 0 else "<"
        lines.append(f"{ya},{xa},{yb},{xb},{rel},{w},{h}")
    with open(os.path.join(root, "DIW_test.csv"), "w") as f:
        f.write("\n".join(lines) + "\n")


def test_parse_official_layout(tmp_path):
    _fake_tree(tmp_path, n_images=3)
    items = load_diw(str(tmp_path))
    assert len(items) == 3
    it = items[0]
    # 1-indexed csv -> 0-indexed pairs
    np.testing.assert_allclose(it.pairs[0, :4], [4, 6, 29, 49])
    assert it.pairs[0, 4] == 1.0  # ">" = A farther
    assert items[1].pairs[0, 4] == -1.0
    assert it.orig_size == (60, 40)
    assert os.path.exists(it.image_path)


def test_parse_multi_pair_and_missing_images(tmp_path):
    _fake_tree(tmp_path, n_images=2)
    # append a second annotation line to image 0 and a dangling entry
    with open(tmp_path / "DIW_test.csv", "a") as f:
        f.write("/DIW_test/000.jpg\n2,2,3,3,<\n")
        f.write("/DIW_test/missing.jpg\n1,1,2,2,>\n")
    items = load_diw(str(tmp_path))
    assert len(items) == 2  # missing image dropped
    by_name = {os.path.basename(i.image_path): i for i in items}
    assert by_name["000.jpg"].pairs.shape == (2, 5)


class _FakeTrainer:
    """predict = red channel of the input: a depth map we fully control."""

    def jit_predict(self):
        def f(_state, images):
            return np.asarray(images)[..., 0:1]

        return f


def test_evaluate_diw_known_answer(tmp_path):
    """Images whose red channel is a horizontal gradient (closeness grows
    with x). Point A is left of B, so pred[A] < pred[B]: the model always
    'sees' A as farther -> agrees with '>' labels, disagrees with '<'."""
    h, w = 32, 48
    grad = np.tile(np.linspace(0, 255, w, dtype=np.uint8), (h, 1))
    img = np.stack([grad] * 3, axis=-1)
    lines = []
    rels = [">", "<", ">", "<", ">"]
    for i, rel in enumerate(rels):
        rel_path = f"imgs/{i}.png"
        from PIL import Image

        os.makedirs(tmp_path / "imgs", exist_ok=True)
        Image.fromarray(img).save(tmp_path / rel_path)  # png: lossless
        lines.append("/" + rel_path)
        lines.append(f"10,5,20,40,{rel}")  # A at x=5, B at x=40
    with open(tmp_path / "DIW_test.csv", "w") as f:
        f.write("\n".join(lines) + "\n")

    items = load_diw(str(tmp_path))
    out = evaluate_diw(_FakeTrainer(), None, items, input_size=32)
    assert out["n_pairs"] == 5
    # 2 of 5 labels are '<' (A closer) and the gradient model disagrees
    np.testing.assert_allclose(out["diw_whdr"], 2 / 5)


@pytest.mark.slow
def test_zeroshot_cli_diw_end_to_end(tmp_path):
    """Runbook-style: `cli zeroshot --diw_root` on a fake DIW tree with a
    real (untrained ff_smoke) model produces a well-formed diw block."""
    import jax
    from click.testing import CliRunner

    from pldepth_tpu.cli import cli
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.train import Trainer
    from pldepth_tpu.train.checkpoint import save_weights_npz

    _fake_tree(tmp_path / "diw", n_images=4, size=(64, 64))
    cfg = ExperimentConfig(model_name="ff_smoke", input_size=64,
                           batch_size=4, compute_dtype="float32")
    trainer = Trainer(cfg, steps_per_epoch=1,
                      mesh=make_mesh(devices=jax.devices()[:1]))
    weights = str(tmp_path / "w.npz")
    save_weights_npz(weights, trainer.init_state())

    res = CliRunner().invoke(cli, [
        "zeroshot", "--model_name", "ff_smoke", "--load_model_path", weights,
        "--input_size", "64", "--diw_root", str(tmp_path / "diw"),
    ], catch_exceptions=False)
    assert res.exit_code == 0, res.output
    out = json.loads(res.output)
    assert out["diw"]["n_pairs"] == 4
    assert out["diw"]["n_images"] == 4
    assert 0.0 <= out["diw"]["diw_whdr"] <= 1.0
