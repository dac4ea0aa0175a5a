"""Profile the serving forward pass: top device ops by per-call time.

Drives trainer.predict at the serving bench config (448^2, batch 32) and
prints the op-level time breakdown plus XLA cost analysis, to find where the
46 ms/batch forward goes relative to the ~15 ms HBM roofline.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
import glob
import gzip
import json
import tempfile
import time

faulthandler.dump_traceback_later(900, repeat=True)

import numpy as np
import jax
import jax.numpy as jnp

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.train import Trainer

B = int(os.environ.get("P_B", 32))
S = int(os.environ.get("P_S", 448))
cfg = ExperimentConfig(
    model_name=os.environ.get("P_MODEL", "ff_effnet"), input_size=S,
    batch_size=B, ranking_size=5, rankings_per_image=100, sampling_type=1,
    freeze_encoder=False, initial_lr=1e-3,
    fused_tail=bool(int(os.environ.get("P_FUSED", "1"))),
)
tr = Trainer(cfg, steps_per_epoch=1)
state = tr.init_state()
rng = np.random.default_rng(0)
images = jax.device_put(rng.random((B, S, S, 3), np.float32).astype(np.float32))

pred_fn = jax.jit(
    tr.predict_fused if os.environ.get("P_FUSED_ENC") == "1" else tr.predict
)
out = pred_fn(state, images)
print("warm pred", out.shape, out.dtype, float(out.mean()), flush=True)

# XLA cost analysis of the forward
try:
    ca = pred_fn.lower(state, images).compile().cost_analysis()
    ca0 = ca if isinstance(ca, dict) else ca[0]
    print(f"forward flops={ca0.get('flops', 0)/1e12:.3f} TF  "
          f"bytes={ca0.get('bytes accessed', 0)/1e9:.2f} GB", flush=True)
except Exception as e:
    print("cost analysis failed:", e, flush=True)

trace_dir = tempfile.mkdtemp(prefix="jaxprof_infer_")
NCALLS = 6
with jax.profiler.trace(trace_dir):
    for _ in range(NCALLS):
        out = pred_fn(state, images)
    _ = float(out.mean())

time.sleep(2)
p = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)[0]
with gzip.open(p, "rt") as f:
    data = json.load(f)
evs = data["traceEvents"]
pids = {e["pid"]: e["args"].get("name", "") for e in evs
        if e.get("ph") == "M" and e.get("name") == "process_name"}
dev = [e for e in evs if e.get("ph") == "X" and "TPU" in pids.get(e.get("pid"), "")]
durs = {}
total = 0
for e in dev:
    durs.setdefault(e["name"], [0, None])
    durs[e["name"]][0] += e.get("dur", 0)
    total += e.get("dur", 0)
    ln = e.get("args", {}).get("long_name")
    if ln:
        durs[e["name"]][1] = ln[:160]
print(f"total device time {total/1000/NCALLS:.2f} ms/call over {NCALLS} calls", flush=True)
top = sorted(durs.items(), key=lambda kv: -kv[1][0])[:30]
for name, (d, ln) in top:
    print(f"{d/1000/NCALLS:9.3f} ms/call  {name[:40]:40s} {ln or ''}", flush=True)
