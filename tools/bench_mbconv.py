"""TPU smoke + chained-difference timing: fused MBConv vs XLA reference,
at EfficientNet-B0 @448^2 stage shapes (bs 32)."""
import time
import os
import sys
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
import faulthandler

faulthandler.dump_traceback_later(900, repeat=True)

import numpy as np
import jax
import jax.numpy as jnp

from pldepth_tpu.ops.fused_mbconv import (
    MBConvParams, fused_mbconv_infer, mbconv_infer_ref,
)

B = 32
CASES = [
    # (name, H, W, cin, expand, k, stride, cout)
    ("s2b1", 112, 112, 24, 6, 3, 1, 24),
    ("s3b0", 112, 112, 24, 6, 5, 2, 40),
    ("s4b1", 28, 28, 80, 6, 3, 1, 80),
    ("s1b0", 224, 224, 32, 1, 3, 1, 16),
]


def rand_params(key, cin, ce, cout, k, cse, expand):
    ks = jax.random.split(key, 16)
    f = lambda i, shape, s=0.2: jax.random.normal(ks[i], shape, jnp.float32) * s
    return MBConvParams(
        we=f(0, (cin, ce)) if expand else None,
        e_scale=1.0 + f(1, (ce,), 0.05) if expand else None,
        e_shift=f(2, (ce,), 0.05) if expand else None,
        dw=f(3, (k, k, ce)), d_scale=1.0 + f(4, (ce,), 0.05),
        d_shift=f(5, (ce,), 0.05),
        se_w1=f(6, (ce, cse)), se_b1=f(7, (cse,)),
        se_w2=f(8, (cse, ce)), se_b2=f(9, (ce,)),
        wp=f(10, (ce, cout)), p_scale=1.0 + f(11, (cout,), 0.05),
        p_shift=f(12, (cout,), 0.05),
    )


for name, H, W, cin, expand, k, stride, cout in CASES:
    ce = cin * expand
    cse = max(1, cin // 4)
    key = jax.random.PRNGKey(1)
    p = rand_params(key, cin, ce, cout, k, cse, expand != 1)
    x = (jax.random.normal(key, (B, H, W, cin), jnp.float32) * 0.5).astype(jnp.bfloat16)
    residual = stride == 1 and cin == cout

    fused = jax.jit(lambda x, p: fused_mbconv_infer(
        x, p, kernel=k, stride=stride, residual=residual))
    ref = jax.jit(lambda x, p: mbconv_infer_ref(
        x, p, kernel=k, stride=stride, residual=residual))

    try:
        yf = np.array(fused(x, p), np.float32)
    except Exception as e:
        print(f"{name}: FUSED FAILED: {str(e)[:300]}", flush=True)
        continue
    yr = np.array(ref(x, p), np.float32)
    rel = np.abs(yf - yr).max() / max(np.abs(yr).max(), 1e-9)
    print(f"{name}: rel diff {rel:.2e}", flush=True)

    def chain_time(fn, n):
        def g(x, p):
            def body(_, xc):
                y = fn(xc, p)
                # keep shape: pad channels back via slice/broadcast trick
                return jnp.broadcast_to(
                    y.mean(axis=-1, keepdims=True), xc.shape
                ).astype(xc.dtype) + xc * 0.5
            return jax.lax.fori_loop(0, n, body, x).sum()
        gj = jax.jit(g)
        _ = float(gj(x, p))
        ts = []
        for _ in range(3):
            t0 = time.time(); _ = float(gj(x, p)); ts.append(time.time() - t0)
        return float(np.median(ts))

    n_lo, n_hi = 2, 10
    tf_ = (chain_time(fused, n_hi) - chain_time(fused, n_lo)) / (n_hi - n_lo)
    tr_ = (chain_time(ref, n_hi) - chain_time(ref, n_lo)) / (n_hi - n_lo)
    print(f"{name}: fused {tf_*1e3:.3f} ms  xla {tr_*1e3:.3f} ms  "
          f"speedup {tr_/tf_:.2f}x", flush=True)
