"""Observability: MetricLogger sinks and summary semantics."""

import json
import os

from pldepth_tpu.obs.logging import MetricLogger


def test_jsonl_and_csv_sinks(tmp_path):
    lg = MetricLogger(str(tmp_path), "runA", config={"lr": 0.1})
    lg.log({"loss": 1.5, "lr": 0.1}, step=0)
    lg.log({"loss": 1.2, "lr": 0.09}, step=1)
    lg.set_summary(test_error=0.25)
    lg.close()

    run_dir = tmp_path / "runA"
    with open(run_dir / "metrics.jsonl") as f:
        recs = [json.loads(l) for l in f]
    assert [r["loss"] for r in recs] == [1.5, 1.2]
    assert recs[0]["step"] == 0
    csv_lines = (run_dir / "metrics.csv").read_text().strip().splitlines()
    assert len(csv_lines) == 3  # header + 2 rows
    assert json.load(open(run_dir / "summary.json")) == {"test_error": 0.25}
    assert json.load(open(run_dir / "config.json")) == {"lr": 0.1}


def test_append_across_sessions(tmp_path):
    for i in range(2):
        lg = MetricLogger(str(tmp_path), "runB")
        lg.log({"loss": float(i)}, step=i)
        lg.close()
    with open(tmp_path / "runB" / "metrics.jsonl") as f:
        assert len(f.readlines()) == 2


def test_log_images_writes_pngs(tmp_path):
    import numpy as np

    lg = MetricLogger(str(tmp_path), "runC")
    rng = np.random.default_rng(0)
    lg.log_images(
        {
            "ex_img": rng.random((16, 16, 3)).astype(np.float32),
            "ex_pred": rng.random((16, 16)).astype(np.float32),
            "ex_flat": np.zeros((16, 16), np.float32),  # constant map guard
        }
    )
    lg.close()
    ex = tmp_path / "runC" / "examples"
    assert sorted(p.name for p in ex.iterdir()) == [
        "ex_flat.png", "ex_img.png", "ex_pred.png",
    ]
    from PIL import Image

    assert Image.open(ex / "ex_pred.png").size == (16, 16)
