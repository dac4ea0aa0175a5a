"""Profile the full train step: top device ops by per-step time.

PLDEPTH_PROFILE_K / PLDEPTH_PROFILE_DRAW override ranking_size and the
draw method. How the rank-scatter compaction's 31 ms in-step scatter
fusion was found (docs/BENCH.md).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
import glob
import gzip
import json
import time

faulthandler.dump_traceback_later(900, repeat=True)

import numpy as np
import jax
import jax.numpy as jnp

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.train import Trainer

B = int(os.environ.get("PLDEPTH_PROFILE_B", 32))
S = int(os.environ.get("PLDEPTH_PROFILE_S", 448))
cfg = ExperimentConfig(
    model_name=os.environ.get("PLDEPTH_PROFILE_MODEL", "ff_effnet"),
    input_size=S, batch_size=B,
    ranking_size=int(os.environ.get("PLDEPTH_PROFILE_K", 25)),
    rankings_per_image=100, sampling_type=1, freeze_encoder=False,
    initial_lr=1e-3, sampler_draw_method=os.environ.get("PLDEPTH_PROFILE_DRAW", "auto"),
)
tr = Trainer(cfg, steps_per_epoch=1)
state = tr.init_state()
rng = np.random.default_rng(0)
batch = tr.shard_batch({
    "image": rng.random((B, S, S, 3), np.float32).astype(np.float32),
    "gt": rng.random((B, S, S), np.float32).astype(np.float32),
    "mask": np.ones((B, S, S), np.float32),
})
state, m = tr.train_step(state, batch)
print("warm loss", float(m.loss), flush=True)

import tempfile
trace_dir = tempfile.mkdtemp(prefix="jaxprof_")
with jax.profiler.trace(trace_dir):
    for _ in range(3):
        state, m = tr.train_step(state, batch)
    _ = float(m.loss)

time.sleep(2)
p = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)[0]
with gzip.open(p, "rt") as f:
    data = json.load(f)
evs = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = [e for e in evs if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")]
durs = {}
for e in dev:
    durs.setdefault(e["name"], [0, None])
    durs[e["name"]][0] += e.get("dur", 0)
    ln = e.get("args", {}).get("long_name")
    if ln:
        durs[e["name"]][1] = ln[:160]
top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:25]
for name, (d, ln) in top:
    print(f"{d/3000:9.2f} ms/step  {name[:40]:40s} {ln or ''}", flush=True)
