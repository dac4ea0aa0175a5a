"""wandb adapter record-replay tests.

wandb is not installed in this image, so the sweep backend
(sweep/sweep.py run_wandb_sweep — the reference workflow of
pldepth/hyperopt/sweep.py:12-46) and the MetricLogger forwarding are
exercised against a recording fake that implements the exact call surface
the code uses: module-level sweep/agent/Image/log, and the run object's
config/log/summary/finish. A live smoke against a real server is gated
behind PLDEPTH_WANDB_LIVE=1 (needs the package + an API key).
"""

import os
import sys
import types

import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.sweep.search_spaces import SEARCH_SPACES
from pldepth_tpu.sweep.sweep import run_wandb_sweep, space_to_wandb


class _FakeSummary(dict):
    pass


class _FakeRun:
    def __init__(self, config=None, name=None):
        self.config = dict(config or {})
        self.name = name
        self.summary = _FakeSummary()
        self.logged = []
        self.finished = False

    def log(self, metrics, step=None):
        self.logged.append((dict(metrics), step))

    def finish(self):
        self.finished = True


class FakeWandb(types.ModuleType):
    """Records every adapter call; agent() replays the sweep spec by
    deterministically sampling each parameter and invoking the function."""

    def __init__(self):
        super().__init__("wandb")
        self.sweeps = {}
        self.agent_calls = []
        self.runs = []
        self.module_logged = []
        self._pending_config = {}

    # --- module-level surface -------------------------------------------
    def sweep(self, config, project=None):
        sid = f"fake-sweep-{len(self.sweeps)}"
        self.sweeps[sid] = {"config": config, "project": project}
        return sid

    def agent(self, sweep_id, function=None, count=1, project=None):
        self.agent_calls.append(
            {"sweep_id": sweep_id, "count": count, "project": project}
        )
        spec = self.sweeps.get(sweep_id, {"config": {"parameters": {}}})
        params = spec["config"].get("parameters", {})
        rng = np.random.default_rng(0)
        for _ in range(count):
            draw = {}
            for k, p in params.items():
                if "values" in p:
                    draw[k] = p["values"][int(rng.integers(len(p["values"])))]
                elif p.get("distribution") == "log_uniform_values":
                    draw[k] = float(np.exp(
                        rng.uniform(np.log(p["min"]), np.log(p["max"]))
                    ))
                else:
                    draw[k] = float(rng.uniform(p["min"], p["max"]))
            self._pending_config = draw
            function()

    def init(self, project=None, name=None, config=None):
        run = _FakeRun(config=config or self._pending_config, name=name)
        self.runs.append(run)
        return run

    def log(self, metrics, step=None):
        self.module_logged.append((dict(metrics), step))

    class Image:
        def __init__(self, array, caption=None):
            self.array = np.asarray(array)
            self.caption = caption


def test_space_to_wandb_translation():
    cfg = space_to_wandb(SEARCH_SPACES["base"], target="test_error")
    assert cfg["method"] == "bayes"
    assert cfg["metric"] == {"name": "test_error", "goal": "minimize"}
    p = cfg["parameters"]
    assert p["initial_lr"]["distribution"] == "log_uniform_values"
    assert p["ranking_size"]["values"] == [3, 5, 7, 10, 25]


@pytest.mark.slow
def test_run_wandb_sweep_record_replay():
    """The full backend path: sweep created from the space, the agent drives
    run_single through real (tiny) training runs, metrics reach wandb.log,
    and the best record is returned."""
    fake = FakeWandb()
    # lr-only space so every replayed run reuses one compiled train step
    SEARCH_SPACES["_replay_test"] = {
        "initial_lr": {"min": 1e-4, "max": 1e-2, "log": True}
    }
    try:
        cfg = ExperimentConfig(
            model_name="ff_smoke", dataset="synthetic", ds_size=16,
            input_size=32, batch_size=8, ranking_size=3,
            rankings_per_image=8, sampling_type=1, epochs=1,
            freeze_encoder=False, compute_dtype="float32",
            listmle_impl="xla",
        )
        out = run_wandb_sweep(
            cfg, num_runs=2, target="test_error",
            space_name="_replay_test", _wandb=fake,
        )
    finally:
        del SEARCH_SPACES["_replay_test"]

    # sweep spec reached the server with the translated space
    assert len(fake.sweeps) == 1
    sid = next(iter(fake.sweeps))
    spec = fake.sweeps[sid]["config"]
    assert spec["parameters"]["initial_lr"]["distribution"] == "log_uniform_values"
    # the agent was attached to it and replayed `count` runs
    assert fake.agent_calls == [
        {"sweep_id": sid, "count": 2, "project": "pldepth-tpu-sweep"}
    ]
    assert len(fake.runs) == 2 and all(r.finished for r in fake.runs)
    # every run logged a finite target metric to the server
    assert len(fake.module_logged) == 2
    for metrics, _ in fake.module_logged:
        assert np.isfinite(metrics["test_error"])
    # and the local result mirrors it
    assert out["sweep_id"] == sid and out["num_runs"] == 2
    assert np.isfinite(out["best"]["metrics"]["test_error"])
    assert "initial_lr" in out["best"]["overrides"]


@pytest.mark.slow
def test_run_wandb_sweep_reattach_existing_sweep():
    """--sweep_id re-attaches an agent without creating a new sweep
    (reference hyperopt/restart_sweep.py:11-45)."""
    fake = FakeWandb()
    fake.sweeps["pre-existing"] = {
        "config": {"parameters": {"initial_lr": {
            "distribution": "log_uniform_values", "min": 1e-4, "max": 1e-2}}},
        "project": "pldepth-tpu-sweep",
    }
    cfg = ExperimentConfig(
        model_name="ff_smoke", dataset="synthetic", ds_size=16,
        input_size=32, batch_size=8, ranking_size=3, rankings_per_image=8,
        sampling_type=1, epochs=1, freeze_encoder=False,
        compute_dtype="float32", listmle_impl="xla",
    )
    out = run_wandb_sweep(
        cfg, num_runs=1, target="loss", space_name="base",
        sweep_id="pre-existing", _wandb=fake,
    )
    assert len(fake.sweeps) == 1  # no new sweep created
    assert out["sweep_id"] == "pre-existing"
    assert len(fake.runs) == 1


def test_metric_logger_wandb_record_replay(tmp_path):
    """MetricLogger's wandb forwarding: init(config), per-step log,
    summary assignment, image logging, finish."""
    fake = FakeWandb()
    sys.modules["wandb"] = fake
    try:
        from pldepth_tpu.obs.logging import MetricLogger

        logger = MetricLogger(
            str(tmp_path), "wb_run", {"model_name": "ff_effnet"},
            use_wandb=True,
        )
        logger.log({"loss": 1.5}, step=0)
        logger.log({"loss": 1.2}, step=1)
        logger.set_summary(test_error=0.3)
        logger.log_images({"ex_pred": np.zeros((8, 8), np.float32)})
        logger.close()
    finally:
        del sys.modules["wandb"]

    assert len(fake.runs) == 1
    run = fake.runs[0]
    assert run.name == "wb_run" and run.config == {"model_name": "ff_effnet"}
    assert ({"loss": 1.5}, 0) in run.logged and ({"loss": 1.2}, 1) in run.logged
    assert run.summary["test_error"] == 0.3
    img_logs = [m for m, _ in run.logged if "ex_pred" in m]
    assert img_logs and isinstance(img_logs[0]["ex_pred"], FakeWandb.Image)
    assert run.finished
    # local sinks unaffected by the wandb path
    assert (tmp_path / "wb_run" / "metrics.jsonl").exists()
    assert (tmp_path / "wb_run" / "summary.json").exists()


@pytest.mark.skipif(
    not os.environ.get("PLDEPTH_WANDB_LIVE"),
    reason="live wandb smoke: set PLDEPTH_WANDB_LIVE=1 with wandb installed "
           "and an API key configured",
)
def test_wandb_live_smoke(tmp_path):  # pragma: no cover - needs a server
    from pldepth_tpu.obs.logging import MetricLogger

    logger = MetricLogger(str(tmp_path), "live_smoke", {"smoke": True},
                          use_wandb=True)
    logger.log({"loss": 1.0}, step=0)
    logger.set_summary(ok=1)
    logger.close()
