"""Sweep driver internals: samplers, TPE, analyzer."""

import json

import numpy as np
import pytest

from pldepth_tpu.sweep.analyze import best_trial, load_trials, param_table
from pldepth_tpu.sweep.search_spaces import SEARCH_SPACES
from pldepth_tpu.sweep.sweep import _grid, _sample, _sample_tpe


def _valid(space, cand):
    for k, spec in space.items():
        if "values" in spec:
            assert cand[k] in spec["values"], (k, cand[k])
        else:
            assert spec["min"] <= cand[k] <= spec["max"], (k, cand[k])


def test_random_sampler_respects_space(rng):
    space = SEARCH_SPACES["base"]
    g = np.random.default_rng(0)
    for _ in range(20):
        _valid(space, _sample(space, g))


def test_grid_enumerates_discrete():
    space = {"a": {"values": [1, 2]}, "b": {"values": [10, 20, 30]}}
    combos = list(_grid(space))
    assert len(combos) == 6
    assert {(c["a"], c["b"]) for c in combos} == {
        (a, b) for a in (1, 2) for b in (10, 20, 30)
    }


def test_tpe_prefers_good_region():
    # Target is minimized near initial_lr = 0.01; after seeding history, TPE
    # samples should concentrate near the optimum (vs a uniform-log draw).
    space = {"initial_lr": {"min": 1e-4, "max": 1.0, "log": True}}
    g = np.random.default_rng(0)
    history = []
    for _ in range(30):
        lr = float(np.exp(g.uniform(np.log(1e-4), np.log(1.0))))
        err = abs(np.log(lr) - np.log(0.01)) + 0.05 * g.normal()
        history.append({"overrides": {"initial_lr": lr}, "metrics": {"test_error": err}})
    draws = [
        _sample_tpe(space, history, "test_error", g)["initial_lr"]
        for _ in range(20)
    ]
    for d in draws:
        _valid(space, {"initial_lr": d})
    med_dist = np.median([abs(np.log(d) - np.log(0.01)) for d in draws])
    assert med_dist < 1.5, f"TPE not concentrating: median log-dist {med_dist}"


def test_tpe_falls_back_to_random_with_few_points():
    space = {"x": {"min": 0.0, "max": 1.0}}
    g = np.random.default_rng(1)
    cand = _sample_tpe(space, [], "test_error", g)
    _valid(space, cand)


def test_analyzer_best_and_table(tmp_path):
    path = tmp_path / "state.jsonl"
    with open(path, "w") as f:
        for lr, err in [(0.1, 0.4), (0.01, 0.3), (0.001, float("nan"))]:
            f.write(
                json.dumps(
                    {"overrides": {"initial_lr": lr}, "metrics": {"test_error": err}}
                )
                + "\n"
            )
    trials = load_trials(str(path))
    assert best_trial(trials)["overrides"]["initial_lr"] == 0.01
    table = param_table(trials)
    assert len(table["initial_lr"]) == 2  # NaN filtered


def _fake_run_single(monkeypatch):
    import pldepth_tpu.sweep.sweep as sw

    calls = []

    def fake(cfg, target):
        calls.append(cfg.initial_lr)
        return {"loss": cfg.initial_lr, "test_error": cfg.initial_lr}

    monkeypatch.setattr(sw, "run_single", fake)
    return calls


def test_random_sweep_resume_continues_sequence(tmp_path, monkeypatch):
    """A resumed random sweep must continue the seeded draw sequence, not
    re-evaluate the configs already recorded."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.sweep.sweep import run_sweep

    _fake_run_single(monkeypatch)
    cfg = ExperimentConfig(seed=5, output_dir=str(tmp_path))
    sp = str(tmp_path / "state.jsonl")

    full = run_sweep(cfg, num_runs=4, search="random", target="loss",
                     state_path=str(tmp_path / "full.jsonl"))
    run_sweep(cfg, num_runs=2, search="random", target="loss", state_path=sp)
    resumed = run_sweep(cfg, num_runs=4, search="random", target="loss",
                        state_path=sp)

    with open(sp) as f:
        recs = [json.loads(l)["overrides"] for l in f if l.strip()]
    with open(tmp_path / "full.jsonl") as f:
        want = [json.loads(l)["overrides"] for l in f if l.strip()]
    assert recs == want  # identical sequence, no duplicates
    assert resumed["num_runs"] == 4


def test_grid_sweep_exhausts_gracefully(tmp_path, monkeypatch):
    """num_runs beyond the grid size must stop at the grid, not IndexError."""
    import pldepth_tpu.sweep.sweep as sw
    from pldepth_tpu.core.config import ExperimentConfig

    _fake_run_single(monkeypatch)
    space = {"initial_lr": {"values": [0.1, 0.2]},
             "lr_multi": {"values": [0.5, 1.0]}}
    monkeypatch.setitem(sw.SEARCH_SPACES, "tiny", space)
    cfg = ExperimentConfig(seed=0, output_dir=str(tmp_path))
    out = sw.run_sweep(cfg, num_runs=8, search="grid", target="loss",
                       space_name="tiny",
                       state_path=str(tmp_path / "g.jsonl"))
    assert out["num_runs"] == 4
    assert out["best"] is not None


def test_unknown_sweep_target_rejected(tmp_path):
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.sweep.sweep import run_sweep

    with pytest.raises(ValueError, match="target"):
        run_sweep(ExperimentConfig(output_dir=str(tmp_path)), num_runs=1,
                  target="nonsense")
