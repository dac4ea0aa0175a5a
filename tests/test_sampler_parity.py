"""Sampler distributional parity vs the TF reference samplers (golden side).

tools/sampler_parity_check.py runs the reference's ACTUAL numpy sampling
classes (pldepth/data/sampling.py:100-243) on a fixed synthetic protocol and
stores the resulting chi²/spread/near-equal statistics in
tests/golden/sampler_stats.npz. These tests recompute the our-side statistics
TF-free over the identical protocol and compare — the chi2compare.py:139-161
idea turned into a regression gate. Exact per-list equality is impossible
(different RNGs) and not the contract; distributional agreement is.
"""

import importlib.util
import os

import numpy as np
import pytest

GOLDEN = os.path.join(os.path.dirname(__file__), "golden", "sampler_stats.npz")
TOOL = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "tools",
    "sampler_parity_check.py",
)

# load the tool module so protocol constants / our_stats can't drift from the
# golden generator (the tool pins JAX_PLATFORMS=cpu at import — same as tests)
_spec = importlib.util.spec_from_file_location("sampler_parity_check", TOOL)
_tool = importlib.util.module_from_spec(_spec)
_spec.loader.exec_module(_tool)

pytestmark = pytest.mark.slow


@pytest.mark.parametrize("ours_name", [s[1] for s in _tool.STRATEGIES])
def test_sampler_stats_match_reference(ours_name):
    assert os.path.exists(GOLDEN), (
        "missing golden sampler_stats.npz — regenerate with "
        "tools/sampler_parity_check.py"
    )
    ref = np.load(GOLDEN)
    mine = [_tool.our_stats(ours_name, t) for t in range(_tool.TRIALS)]
    for stat, tol in _tool.TOLERANCES.items():
        ref_mean = float(ref[f"{ours_name}/{stat}"])
        our_mean = float(np.mean([s[stat] for s in mine]))
        rel = abs(our_mean - ref_mean) / max(abs(ref_mean), 1e-3)
        assert rel <= tol or abs(our_mean - ref_mean) < 1e-9, (
            f"{ours_name}/{stat}: ref={ref_mean:.4f} ours={our_mean:.4f} "
            f"rel={rel:.3f} > tol={tol}"
        )
