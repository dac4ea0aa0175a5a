"""Resident-chain length sweep (VERDICT r03 item 7): close or explain the
~4% gap between the chained resident fed rate and the pure device rate.

The chain (Trainer.resident_chain) exists to amortize per-dispatch latency;
r03 measured 383.3 img/s at chain=10 vs 398.4 device rate. Per-dispatch
overhead d and per-step time t give ms_per_step(n) = t + d/n — the sweep
fits d and reports where the curve saturates.

Methodology note (docs/BENCH.md "Methodology warnings"): on this
tunnel-attached backend ``block_until_ready`` can return ~80x before
execution completes (measured: 4.5 ms for an ~85 ms step), so each timing
is a chained difference — D and 2D dispatches, each ended by a real host
value fetch of the final loss (the donated state carry makes every prior
dispatch a data dependency of that value); the fetch RTT cancels in the
difference. A cheap block_until_ready every other dispatch stays as queue
backpressure only (unsynced dispatch floods have wedged this transport).

Run on TPU from the repo root:
  python -u tools/bench_resident_chain.py
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler

faulthandler.dump_traceback_later(1800, repeat=True)


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

    def timed_run(chain_fn, state, dispatches):
        t0 = time.time()
        for i in range(dispatches):
            state, m = chain_fn(state, store.arrays)
            if i % 2 == 1:
                m.loss.block_until_ready()  # backpressure only, not a sync
        # real sync: fetch a value that depends on every prior dispatch
        last = m.loss if m.loss.ndim == 0 else m.loss[-1]
        float(jax.device_get(last))
        return time.time() - t0, state

    results = {}
    for n in (1, 8, 32, 128):
        chain = trainer.resident_chain(n)
        _, state = timed_run(chain, state, 2)  # compile + settle
        d_lo = max(2, 256 // n)
        t_lo, state = timed_run(chain, state, d_lo)
        t_hi, state = timed_run(chain, state, 2 * d_lo)
        per_dispatch = (t_hi - t_lo) / d_lo
        per_step = per_dispatch / n
        results[n] = {
            "images_per_sec": round(batch / per_step, 2),
            "ms_per_dispatch": round(per_dispatch * 1e3, 2),
            "ms_per_step": round(per_step * 1e3, 3),
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
