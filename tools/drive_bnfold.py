"""Drive: bn_fold serving path vs standard serving on the real TPU chip.

Same-session interleaved chained-difference pairs (docs/BENCH.md
methodology): per-forward time = (med(chain16) - med(chain4)) / 12.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
import time

faulthandler.dump_traceback_later(600, repeat=True)

import jax
import jax.numpy as jnp
import numpy as np

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.train import Trainer

print("devices:", jax.devices(), flush=True)

BATCH = int(os.environ.get("DRIVE_BATCH", 32))
SIZE = int(os.environ.get("DRIVE_SIZE", 448))
MODEL = os.environ.get("DRIVE_MODEL", "ff_effnet")
cfg = ExperimentConfig(
    model_name=MODEL, input_size=SIZE, batch_size=BATCH,
    ranking_size=5, rankings_per_image=100,
)
print(f"model={MODEL} batch={BATCH} size={SIZE}", flush=True)
trainer = Trainer(cfg, steps_per_epoch=1)
state = trainer.init_state()
images = jax.device_put(
    np.random.default_rng(0).uniform(size=(BATCH, SIZE, SIZE, 3)).astype(np.float32)
)

# numerics parity on chip (bf16 compute)
p_ref = np.asarray(trainer.jit_predict()(state, images))
p_fold = np.asarray(trainer.jit_predict(fused="bn_fold")(state, images))
rel = np.max(np.abs(p_fold - p_ref)) / (np.max(np.abs(p_ref)) + 1e-12)
print(f"TPU parity (bf16): max rel {rel:.3e}", flush=True)


def chain(fn, n):
    def f(s, x):
        def body(_, xc):
            p = fn(s, xc)
            return jnp.stack([p, p, p], axis=-1)
        return jax.lax.fori_loop(0, n, body, x).sum()
    return jax.jit(f)


def measure(fn, tag):
    f_lo, f_hi = chain(fn, 4), chain(fn, 16)
    _ = float(f_lo(state, images)); _ = float(f_hi(state, images))
    def med(f):
        ts = []
        for _ in range(5):
            t0 = time.time()
            _ = float(f(state, images))
            ts.append(time.time() - t0)
        return float(np.median(ts))
    st = (med(f_hi) - med(f_lo)) / 12.0
    print(f"{tag}: {st * 1e3:.2f} ms/forward -> {BATCH / st:.1f} img/s", flush=True)
    return st


t_std1 = measure(trainer.predict, "standard #1")
t_fold = measure(trainer.predict_bnfold, "bn_fold    ")
t_std2 = measure(trainer.predict, "standard #2")
print(
    f"verdict: bn_fold {t_fold * 1e3:.2f} ms vs standard "
    f"{(t_std1 + t_std2) / 2 * 1e3:.2f} ms "
    f"({(t_fold / ((t_std1 + t_std2) / 2) - 1) * 100:+.1f}%)",
    flush=True,
)
