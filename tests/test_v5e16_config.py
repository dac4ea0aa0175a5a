"""Standing correctness gate for the checked-in v5e-16 config
(configs/ff_effnet_b4_640_v5e16.json, BASELINE.json config #5) — the one
config that had never been exercised end-to-end before round 4. Runs in a
child process because it needs a 16-device virtual mesh (the session
conftest pins 8).
"""

import json
import os
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow


def test_v5e16_config_trains_and_serves():
    child = os.path.join(
        os.path.dirname(os.path.abspath(__file__)), "helpers", "v5e16_child.py"
    )
    env = dict(os.environ)
    env.pop("PYTHONPATH", None)
    res = subprocess.run(
        [sys.executable, "-u", child],
        capture_output=True, text=True, timeout=1800, env=env,
    )
    assert res.returncode == 0, f"stdout:\n{res.stdout}\nstderr:\n{res.stderr}"
    out = json.loads(res.stdout.strip().splitlines()[-1])
    assert out["ok"] is True and out["devices"] == 16
