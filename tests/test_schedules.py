"""Schedule semantics vs the reference callbacks' closed forms."""

import numpy as np
import jax.numpy as jnp

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.train.schedules import build_schedule, sgdr_schedule, step_decay_schedule


def test_sgdr_non_cyclic_matches_reference_formula():
    # reference clr(): lr = min + 0.5*(max-min)*(1+cos(pi * t / (spe*cycle)))
    # (training_utils.py:69-73), used non-cyclically (PLDepth.py:121-126)
    max_lr, min_lr, spe, epochs = 0.01, 0.0025, 10, 5
    sched = sgdr_schedule(max_lr, min_lr, spe * epochs)
    for t in [0, 7, 23, 49]:
        want = min_lr + 0.5 * (max_lr - min_lr) * (
            1 + np.cos(np.pi * t / (spe * epochs))
        )
        np.testing.assert_allclose(float(sched(t)), want, rtol=1e-6)
    np.testing.assert_allclose(float(sched(0)), max_lr, rtol=1e-6)
    # just before the cycle boundary the lr has annealed essentially to min
    np.testing.assert_allclose(float(sched(spe * epochs - 1)), min_lr, rtol=2e-2)


def test_sgdr_restart_decay():
    sched = sgdr_schedule(0.1, 0.01, steps_per_cycle=10, lr_decay=0.5, mult_factor=1.0)
    # start of second cycle: peak halves
    np.testing.assert_allclose(float(sched(10)), 0.01 + 0.5 * (0.05 - 0.01) * 2, rtol=1e-6)


def test_sgdr_mult_factor_geometric_cycles():
    sched = sgdr_schedule(0.1, 0.0, steps_per_cycle=10, lr_decay=1.0, mult_factor=2.0)
    # cycles: [0,10), [10,30), [30,70) — each restarts at max
    for t0 in [0, 10, 30]:
        np.testing.assert_allclose(float(sched(t0)), 0.1, rtol=1e-5)
    # middle of second cycle -> half of cosine
    np.testing.assert_allclose(float(sched(20)), 0.05, rtol=1e-5)


def test_step_decay_with_warmup():
    # reference LearningRateScheduleProvider (training_utils.py:112-135)
    sched = step_decay_schedule(
        0.1, steps_per_epoch=10, milestones=(2, 4), multiplier=0.1, warmup_epochs=1
    )
    assert np.isclose(float(sched(5)), (0 + 1) * 0.1 / 1)  # warmup epoch 0
    assert np.isclose(float(sched(15)), 0.1)  # epoch 1
    assert np.isclose(float(sched(25)), 0.01)  # epoch 2 (>= milestone 2)
    assert np.isclose(float(sched(45)), 0.001)  # epoch 4 (>= milestone 4)


def test_build_schedule_sgdr_decays_to_lr_multi():
    cfg = ExperimentConfig(initial_lr=0.01, lr_multi=0.25, epochs=4, schedule="sgdr")
    sched = build_schedule(cfg, steps_per_epoch=5)
    assert np.isclose(float(sched(0)), 0.01)
    np.testing.assert_allclose(float(sched(19)), 0.0025, rtol=3e-2)


def test_sgdr_rejects_shrinking_cycles():
    """mult_factor < 1 terminates the geometric cycle series and then
    produces NaN learning rates; reject it up front."""
    import pytest

    from pldepth_tpu.train.schedules import sgdr_schedule

    with pytest.raises(ValueError, match="mult_factor"):
        sgdr_schedule(0.1, 0.001, 100, mult_factor=0.5)
