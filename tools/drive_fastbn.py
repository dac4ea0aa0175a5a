"""A/B probe: two-pass (tf.nn.moments-parity) vs one-pass BN variance on the
ff_redweb train step. Prints XLA cost analysis (flops, bytes) and
chained-difference step time for both variants on the real chip.

Run from the repo root: python -u tools/drive_fastbn.py  (TPU ambient)
"""
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def build(fast: bool):
    import flax.linen as nn
    import jax.numpy as jnp

    import pldepth_tpu.models.decoders as dec
    import pldepth_tpu.models.resnet as rn

    def mk(eps):
        def _bn(name, train):
            return nn.BatchNorm(
                use_running_average=not train, momentum=0.99, epsilon=eps,
                dtype=jnp.float32, use_fast_variance=fast, name=name,
            )
        return _bn

    rn._bn = mk(1.001e-5)
    dec._bn = mk(1e-3)

    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(
        model_name="ff_redweb", input_size=448, batch_size=16,
        ranking_size=5, rankings_per_image=100, sampling_type=1,
        freeze_encoder=True, initial_lr=1e-3,
    )
    t = Trainer(cfg, steps_per_epoch=1)
    return t, cfg


def measure(tag: str, fast: bool):
    import jax
    import jax.numpy as jnp

    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset

    t, cfg = build(fast)
    state = t.init_state()
    ds = SyntheticDepthDataset(n=32, image_size=448, seed=0)
    it = BatchIterator(ds, cfg.batch_size, seed=0)
    batch = t.shard_batch(next(it))
    it.close()

    comp = t.train_step.lower(state, batch).compile()
    ca = comp.cost_analysis()
    ca0 = ca if isinstance(ca, dict) else ca[0]
    flops = float(ca0.get("flops", 0.0))
    byts = float(ca0.get("bytes accessed", 0.0))

    def chain(n):
        def f(st, bt):
            def body(_, carry):
                st2, acc = carry
                st2, m2 = t.train_step(st2, bt)
                return (st2, acc + m2.loss)
            _, acc = jax.lax.fori_loop(0, n, body, (st, jnp.float32(0)))
            return acc
        return jax.jit(f)

    f_lo, f_hi = chain(2), chain(10)
    l0 = float(f_lo(state, batch))
    _ = float(f_hi(state, batch))

    def med(f):
        ts = []
        for _ in range(3):
            t0 = time.time()
            _ = float(f(state, batch))
            ts.append(time.time() - t0)
        return float(np.median(ts))

    st_ms = (med(f_hi) - med(f_lo)) / 8 * 1000
    print(json.dumps({
        "variant": tag, "flops_T": round(flops / 1e12, 3),
        "bytes_GB": round(byts / 2**30, 2), "step_ms": round(st_ms, 2),
        "img_s": round(cfg.batch_size / (st_ms / 1000), 1),
        "loss2": round(l0, 4),
        "tflops_s": round(flops / (st_ms / 1000) / 1e12, 1),
    }), flush=True)


if __name__ == "__main__":
    measure("two_pass", fast=False)
    measure("one_pass", fast=True)
