"""Chained-difference timing of sample_rankings_batch across configs.

Run on the TPU: python -u tools/bench_sampler.py (from the repo root; do
not set PYTHONPATH — see .claude/skills/verify/SKILL.md).
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
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


def bench(name, k, factor):
    def chain(n):
        def f(key):
            def body(_, kk):
                r = sample_rankings_batch(
                    jax.random.fold_in(kk[0], 1), gts, masks,
                    sampler_name=name, rankings_per_image=100,
                    ranking_size=k, oversample_factor=factor,
                )
                # data dependency: fold the result back into the key
                return (jax.random.fold_in(kk[0], jnp.sum(r).astype(jnp.int32) & 7), r.sum())
            kk, s = jax.lax.fori_loop(0, n, body, (key, jnp.float32(0)))
            return s
        return jax.jit(f)

    lo, hi = 2, 12
    f_lo, f_hi = chain(lo), chain(hi)
    key = jax.random.key(0)
    _ = float(f_lo(key)); _ = float(f_hi(key))
    def med(f):
        ts = []
        for _ in range(3):
            t0 = time.time(); _ = float(f(key)); ts.append(time.time() - t0)
        return float(np.median(ts))
    st = (med(f_hi) - med(f_lo)) / (hi - lo)
    print(f"{name} K={k} factor={factor}: {st*1000:.2f} ms/call (batch {B})", flush=True)


bench("info_score", 5, 5.0)
bench("info_score", 25, 5.0)
bench("purely_masked", 25, 1.0)
bench("info_score", 25, 2.0)
print("DONE", flush=True)
