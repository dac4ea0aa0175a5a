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


def test_wandb_adapter_with_stub(tmp_path, monkeypatch):
    """Gated wandb path: verify init/log/summary/finish calls against a stub
    module (wandb is not installed in this image; the adapter must degrade
    to local-only without it and forward faithfully with it)."""
    import sys
    import types

    import numpy as np

    calls = {"log": [], "summary": {}, "finished": False}

    class _Run:
        summary = calls["summary"]

        def log(self, metrics, step=None):
            calls["log"].append((metrics, step))

        def finish(self):
            calls["finished"] = True

    stub = types.ModuleType("wandb")
    stub.init = lambda **kw: _Run()

    class _Image:
        def __init__(self, arr, caption=None):
            self.caption = caption

    stub.Image = _Image
    monkeypatch.setitem(sys.modules, "wandb", stub)

    lg = MetricLogger(str(tmp_path), "wb", config={"x": 1}, use_wandb=True)
    lg.log({"loss": 0.5}, step=3)
    lg.set_summary(test_error=0.1)
    lg.log_images({"ex": np.random.rand(8, 8)}, captions={"ex": "cap"})
    lg.close()

    assert ({"loss": 0.5}, 3) in calls["log"]
    assert calls["summary"]["test_error"] == 0.1
    assert any(isinstance(v, _Image) for m, _ in calls["log"] for v in m.values())
    assert calls["finished"]


def test_mlflow_adapter_with_stub(tmp_path, monkeypatch):
    """Gated mlflow path (reference env.py:28-37 + tracking_utils.py:8-10):
    params logged once at init, scalar metrics per step, summary metrics,
    end_run on close — against a stub module (mlflow is not installed)."""
    import sys
    import types

    calls = {"params": {}, "metrics": [], "uri": None, "started": None,
             "ended": False}

    stub = types.ModuleType("mlflow")
    stub.set_tracking_uri = lambda u: calls.__setitem__("uri", u)
    stub.start_run = lambda run_name=None: calls.__setitem__("started", run_name)
    stub.log_params = lambda p: calls["params"].update(p)
    stub.log_metrics = lambda m, step=None: calls["metrics"].append((m, step))
    stub.end_run = lambda: calls.__setitem__("ended", True)
    monkeypatch.setitem(sys.modules, "mlflow", stub)

    lg = MetricLogger(str(tmp_path), "ml", config={"lr": 0.01, "k": 5},
                      use_mlflow=True, mlflow_tracking_uri="file:/tmp/mlruns")
    lg.log({"loss": 0.7, "note": "non-scalar skipped"}, step=2)
    lg.set_summary(test_error=0.12)
    lg.close()

    assert calls["uri"] == "file:/tmp/mlruns"
    assert calls["started"] == "ml"
    assert calls["params"]["lr"] == "0.01"
    assert ({"loss": 0.7}, 2) in calls["metrics"]
    assert ({"summary_test_error": 0.12}, None) in calls["metrics"]
    assert calls["ended"]


def test_tensorboard_sink_writes_event_files(tmp_path):
    """Gated TB sink (reference tracking_utils.py:33-39 third logging
    system): scalars + images land in an event file under <run>/tb."""
    import glob

    import numpy as np

    lg = MetricLogger(str(tmp_path), "tb_run", use_tensorboard=True)
    if lg._tb is None:
        import pytest

        pytest.skip("tensorboard writer unavailable")
    lg.log({"loss": 1.5, "lr": 0.01}, step=0)
    lg.set_summary(test_error=0.2)
    lg.log_images({"ex": np.random.rand(8, 8)})
    lg.close()
    events = glob.glob(os.path.join(str(tmp_path), "tb_run", "tb", "events.*"))
    assert events and os.path.getsize(events[0]) > 0


def test_csv_schema_grows_with_new_keys(tmp_path):
    """Per-step records must not freeze the CSV column set: epoch records
    logged later keep their loss/val_loss columns (schema rewrite)."""
    import csv

    ml = MetricLogger(str(tmp_path), "run")
    ml.log({"step_loss": 1.0}, step=1)
    ml.log({"loss": 0.5, "val_loss": 0.6}, step=2)
    ml.log({"step_loss": 0.9}, step=3)
    with open(tmp_path / "run" / "metrics.csv", newline="") as f:
        rows = list(csv.DictReader(f))
    assert len(rows) == 3
    assert rows[1]["loss"] == "0.5" and rows[1]["val_loss"] == "0.6"
    assert rows[0]["step_loss"] == "1.0" and rows[2]["step_loss"] == "0.9"


def test_log_images_rgb_passthrough(tmp_path):
    """A dim RGB image must NOT be min-max stretched (docstring contract:
    RGB in [0,1] passes through; grayscale is min-max scaled)."""
    import numpy as np
    from PIL import Image

    ml = MetricLogger(str(tmp_path), "run")
    rgb = np.full((8, 8, 3), 0.25, np.float32)
    ml.log_images({"dim": rgb})
    arr = np.asarray(Image.open(tmp_path / "run" / "examples" / "dim.png"))
    assert abs(int(arr.max()) - 64) <= 1  # 0.25*255, not 255
