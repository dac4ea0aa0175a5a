"""Profile the info-score sampler standalone: top device ops by time.

Writes a perfetto trace under /tmp/jaxprof and prints the aggregate
per-op-name device durations (how the 67 ms boolean-gather fusion of the
rejection draw was found — docs/BENCH.md).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
import glob
import gzip
import json
import time

faulthandler.dump_traceback_later(600, repeat=True)

import numpy as np
import jax
import jax.numpy as jnp

from pldepth_tpu.sampling import sample_rankings_batch

B, H = 32, 448
rng = np.random.default_rng(0)
gts = jnp.asarray(rng.random((B, H, H), np.float32))
masks = jnp.ones((B, H, H), jnp.float32)


def call(key):
    return sample_rankings_batch(
        key, gts, masks, sampler_name="info_score",
        rankings_per_image=100, ranking_size=25, oversample_factor=5.0,
    )


key = jax.random.key(0)
out = call(key)
jax.block_until_ready(out)

import tempfile
trace_dir = tempfile.mkdtemp(prefix="jaxprof_")
with jax.profiler.trace(trace_dir):
    for i in range(5):
        out = call(jax.random.fold_in(key, i))
    jax.block_until_ready(out)
    _ = float(jnp.sum(out))

time.sleep(2)
# parse the perfetto trace: sum durations by op name on device tracks
paths = glob.glob(os.path.join(trace_dir, "**", "*.trace.json.gz"), recursive=True)
print("traces:", paths, flush=True)
events = []
for p in paths:
    with gzip.open(p, "rt") as f:
        data = json.load(f)
    events.extend(data.get("traceEvents", []))
durs = {}
for e in events:
    if e.get("ph") == "X" and "dur" in e:
        name = e.get("name", "?")
        durs[name] = durs.get(name, 0) + e["dur"]
top = sorted(durs.items(), key=lambda kv: -kv[1])[:40]
for name, d in top:
    print(f"{d/1000:10.2f} ms  {name[:110]}")
