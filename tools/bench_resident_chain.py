"""Resident-chain length sweep (VERDICT r03 item 7): close or explain the
~4% gap between the chained resident fed rate and the pure device rate.

The chain (Trainer.resident_chain) exists to amortize per-dispatch latency;
r03 measured 383.3 img/s at chain=10 vs 398.4 device rate. Per-dispatch
overhead d and per-step time t give rate(n) = B*n / (n*t + d) — the sweep
fits d and reports where the curve saturates.

Run on TPU from the repo root:
  python -u tools/bench_resident_chain.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax

    from pldepth_tpu.core.cache import enable_compilation_cache
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import SyntheticDepthDataset, build_resident_store
    from pldepth_tpu.train import Trainer

    enable_compilation_cache()
    size = int(os.environ.get("BENCH_IMAGE_SIZE", 448))
    batch = int(os.environ.get("BENCH_BATCH", 32))
    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=size, batch_size=batch,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
        freeze_encoder=True, initial_lr=1e-3,
    )
    trainer = Trainer(cfg, steps_per_epoch=1)
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=max(2 * batch, 16), image_size=size, seed=0)
    store = build_resident_store(ds, trainer.mesh)

    results = {}
    for n in (1, 8, 32, 128):
        chain = trainer.resident_chain(n)
        state, m = chain(state, store.arrays)  # compile + settle
        jax.block_until_ready(m.loss)
        # wall clock across enough dispatches to cover >= 256 steps
        dispatches = max(1, 256 // n)
        t0 = time.time()
        for _ in range(dispatches):
            state, m = chain(state, store.arrays)
            jax.block_until_ready(m.loss)
        dt = time.time() - t0
        steps = dispatches * n
        results[n] = {
            "images_per_sec": round(steps * batch / dt, 2),
            "ms_per_dispatch": round(dt / dispatches * 1e3, 2),
            "ms_per_step": round(dt / steps * 1e3, 3),
        }
        print(json.dumps({"chain": n, **results[n]}), flush=True)

    # fit per-dispatch overhead d from the two extremes:
    # ms_per_step(n) = t + d/n  ->  d = (s1 - s128) / (1/1 - 1/128)
    s = {n: results[n]["ms_per_step"] for n in results}
    d = (s[1] - s[128]) / (1 - 1 / 128)
    t = s[128] - d / 128
    print(json.dumps({
        "fit_per_dispatch_overhead_ms": round(d, 2),
        "fit_pure_step_ms": round(t, 3),
        "device_rate_from_fit": round(batch / (t / 1e3), 2),
    }))


if __name__ == "__main__":
    main()
