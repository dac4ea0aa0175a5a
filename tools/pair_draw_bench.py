"""Paired full-step measurement: sampler draw 'packed' (sort compaction)
vs 'hier' (chunked rank lookup) in ONE process/session, chained-difference
methodology (docs/BENCH.md). Usage: python -u pair_draw_bench.py"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
import time

faulthandler.dump_traceback_later(1800, repeat=True)

import numpy as np
import jax
import jax.numpy as jnp

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.train import Trainer

B = int(os.environ.get("P_B", 32))
S = int(os.environ.get("P_S", 448))
K = int(os.environ.get("P_K", 5))

rng = np.random.default_rng(0)
host_batch = {
    "image": rng.random((B, S, S, 3), np.float32).astype(np.float32),
    "gt": rng.random((B, S, S), np.float32).astype(np.float32),
    "mask": (rng.random((B, S, S)) < 0.8).astype(np.float32),
}

results = {}
for method in ("packed", "hier"):
    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=S, batch_size=B, ranking_size=K,
        rankings_per_image=100, sampling_type=1, freeze_encoder=False,
        initial_lr=1e-3, sampler_draw_method=method,
    )
    tr = Trainer(cfg, steps_per_epoch=1)
    state = tr.init_state()
    batch = tr.shard_batch(host_batch)

    def chain(n, tr=tr):
        def f(st, bt):
            def body(_, carry):
                st2, acc = carry
                st2, m2 = tr.train_step(st2, bt)
                return (st2, acc + m2.loss)
            _, acc = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
            return acc
        return jax.jit(f)

    n_lo, n_hi = 2, 12
    f_lo, f_hi = chain(n_lo), chain(n_hi)
    l_lo = float(f_lo(state, batch))
    l_hi = float(f_hi(state, batch))
    print(f"{method}: compiled, loss chains {l_lo:.4f} / {l_hi:.4f}", flush=True)

    def med(f):
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(f(state, batch))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    step = (med(f_hi) - med(f_lo)) / (n_hi - n_lo)
    results[method] = step
    print(f"{method}: {step * 1e3:.2f} ms/step -> {B / step:.1f} img/s", flush=True)

print({k: round(v * 1e3, 2) for k, v in results.items()}, flush=True)
