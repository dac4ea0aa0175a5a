"""Drive: compressed-residual training (--qres) vs standard on the real chip.

Headline config (ff_effnet @448^2 b32, K=5, info-score, frozen encoder),
same-session chained-difference (docs/BENCH.md methodology), variants
bracketed base/int8/bf16/base. Also prints XLA cost-analysis bytes so the
byte reduction is visible next to the time delta.

Run from the repo root: python -u tools/drive_qres.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(1800, repeat=True)


def measure(qres: str):
    import jax
    import jax.numpy as jnp

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=448, batch_size=32,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
        freeze_encoder=True, initial_lr=1e-3, qres=qres,
    )
    t = Trainer(cfg, steps_per_epoch=1)
    state = t.init_state()
    ds = SyntheticDepthDataset(n=64, image_size=448, seed=0)
    it = BatchIterator(ds, 32, seed=0)
    batch = t.shard_batch(next(it))
    it.close()

    byts = None
    try:
        ca = t.train_step.lower(state, batch).compile().cost_analysis()
        ca0 = ca if isinstance(ca, dict) else ca[0]
        byts = float(ca0.get("bytes accessed", 0.0))
    except Exception:
        pass

    def chain(n):
        def f(st, bt):
            def body(_, carry):
                st2, acc = carry
                st2, m2 = t.train_step(st2, bt)
                return (st2, acc + m2.loss)
            _, acc = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
            return acc
        return jax.jit(f)

    f_lo, f_hi = chain(2), chain(12)
    loss2 = float(f_lo(state, batch))
    _ = float(f_hi(state, batch))

    def med(f):
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(f(state, batch))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    st_ms = (med(f_hi) - med(f_lo)) / 10 * 1000
    print(json.dumps({
        "qres": qres or "off",
        "bytes_GB": round(byts / 2**30, 2) if byts else None,
        "step_ms": round(st_ms, 2),
        "img_s": round(32 / (st_ms / 1000), 1),
        "loss2": round(loss2, 4),
    }), flush=True)
    return st_ms


if __name__ == "__main__":
    from pldepth_tpu.core.cache import enable_compilation_cache

    enable_compilation_cache()
    measure("")
    measure("int8")
    measure("bf16")
    measure("")  # bracket: session drift check
