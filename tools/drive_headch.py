"""Drive: decoder_head_ch=128 (lane-filling) vs 32 (reference width) on the
real TPU chip — headline train config (ff_effnet @448^2, b32, K=5, RPI=100,
info-score, frozen encoder, fused tail).

Interleaved chained-difference pairs (docs/BENCH.md methodology):
per-step time = (med(chain(2+N)) - med(chain(2))) / N. head_ch=128 DEVIATES
from the reference architecture (different trained function), so whatever
the verdict, the default stays 32; this measurement decides whether the
flag is worth advertising for from-scratch TPU training.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import faulthandler
import time

faulthandler.dump_traceback_later(900, repeat=True)

import jax
import jax.numpy as jnp
import numpy as np

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
from pldepth_tpu.train import Trainer

print("devices:", jax.devices(), flush=True)

BATCH, SIZE, N = 32, 448, 10


def make(head_ch):
    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=SIZE, batch_size=BATCH,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
        freeze_encoder=True, initial_lr=1e-3, decoder_head_ch=head_ch,
    )
    tr = Trainer(cfg, steps_per_epoch=1)
    state = tr.init_state()
    ds = SyntheticDepthDataset(n=BATCH, image_size=SIZE, seed=0)
    batch = tr.shard_batch(next(BatchIterator(ds, BATCH, seed=0)))
    n_params = sum(int(np.prod(p.shape)) for p in jax.tree.leaves(state.params))
    print(f"head_ch={head_ch}: {n_params / 1e6:.3f}M params", flush=True)
    return tr, state, batch


def chain(tr, n):
    def f(st, bt):
        def body(_, carry):
            st2, acc = carry
            st2, m2 = tr.train_step(st2, bt)
            return (st2, acc + m2.loss)
        _, acc = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
        return acc
    return jax.jit(f)


def measure(tr, state, batch, tag):
    f_lo, f_hi = chain(tr, 2), chain(tr, 2 + N)
    _ = float(f_lo(state, batch)); _ = float(f_hi(state, batch))
    def med(f):
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(f(state, batch))
            ts.append(time.time() - t0)
        return float(np.median(ts))
    st = (med(f_hi) - med(f_lo)) / N
    print(f"{tag}: {st * 1e3:.2f} ms/step -> {BATCH / st:.1f} img/s", flush=True)
    return st


tr32, s32, b32 = make(32)
tr128, s128, b128 = make(128)

t32a = measure(tr32, s32, b32, "head_ch=32  #1")
t128 = measure(tr128, s128, b128, "head_ch=128   ")
t32b = measure(tr32, s32, b32, "head_ch=32  #2")
t32 = (t32a + t32b) / 2
print(
    f"verdict: head_ch=128 {t128 * 1e3:.2f} ms vs head_ch=32 {t32 * 1e3:.2f} ms "
    f"({(t128 / t32 - 1) * 100:+.1f}%)",
    flush=True,
)
