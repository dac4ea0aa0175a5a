"""Multi-host SPMD: 2 OS processes x 4 virtual CPU devices, Gloo collectives.

Validates the jax.distributed code paths that the single-process virtual
mesh cannot: BatchIterator host sharding (disjoint per-process strides of
one global batch) and Trainer.shard_batch's
make_array_from_process_local_data branch, with the gradient psum crossing
the process boundary inside the jitted train step.
"""

import os
import re
import socket
import subprocess
import sys

import pytest

pytestmark = pytest.mark.slow

_CHILD = os.path.join(os.path.dirname(__file__), "helpers", "multihost_child.py")


def test_warmup_collectives_single_process():
    """Single-process path: returns the data-axis length (8 virtual devs)."""
    from pldepth_tpu.core.mesh import make_mesh, warmup_collectives

    assert warmup_collectives(make_mesh()) == 8.0


def _free_port() -> int:
    with socket.socket() as s:
        s.bind(("localhost", 0))
        return s.getsockname()[1]


def test_two_process_train_step():
    port = _free_port()
    env = dict(os.environ)
    env.pop("JAX_PLATFORMS", None)  # child pins cpu itself
    env["PYTHONPATH"] = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    env.setdefault(
        "PLDEPTH_JAX_CACHE",
        os.path.join(env["PYTHONPATH"], ".jax_cache"),
    )
    procs = [
        subprocess.Popen(
            [sys.executable, "-u", _CHILD, str(i), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for i in range(2)
    ]
    outs = []
    for p in procs:
        try:
            out, _ = p.communicate(timeout=1500)
        except subprocess.TimeoutExpired:
            for q in procs:
                q.kill()
            raise
        outs.append(out)
    for i, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"proc {i} failed:\n{out[-4000:]}"
    losses = [
        re.search(r"OK loss=([0-9.]+)", out).group(1) for out in outs
    ]
    # replicated metrics: both processes must see the same loss bits
    assert losses[0] == losses[1], losses
