"""Train-mode BatchNorm(+swish) with a compressed backward residual.

The headline train step is HBM-bound (docs/BENCH.md byte/FLOP split) and,
with the reference's BN-only-trainable encoders
(/root/reference/pldepth/models/pl_hourglass.py:53-57), the frozen convs'
weight gradients are dead code — what backward actually touches in the
encoder is the BN/activation chain's saved tensors. This op fuses the
conv-following ``BN -> swish`` pair into ONE differentiable unit whose
entire large-tensor residual is the normalized activation x̂ stored
compressed:

* ``store="int8"``  — per-tensor symmetric int8 (x̂ is zero-mean
  unit-variance, so the dynamic range is tight); 1 byte/element.
* ``store="bf16"`` — plain bf16 x̂; 2 bytes/element, tighter numerics.

The FORWARD math is bit-identical to the standard path (flax BatchNorm
with float32 two-pass variance — the TF train-mode-parity formulation —
then bf16 swish): compression only changes what the backward reads.
Backward reconstructs y = γ·x̂ + β from the stored x̂ and applies the
standard BN+swish VJP; the quantization error perturbs gradients only
(measured in tests/test_qres.py; opt-in via ``--qres int8|bf16``).

Why not ``jax.checkpoint``: remat re-reads inputs and re-runs the chain
(measured slower on this HBM-bound step, docs/BENCH.md "remat"); this op
removes residual bytes without recompute of the stats passes.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Optional

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

_AXES = (0, 1, 2)


def _stats(xf: jnp.ndarray, eps: float):
    # Two-pass (tf.nn.moments-parity) batch statistics in f32 — identical
    # to flax BatchNorm(use_fast_variance=False); see models/efficientnet.py
    # _bn for why one-pass cancellation breaks TF parity.
    mean = jnp.mean(xf, _AXES)
    var = jnp.mean(jnp.square(xf - mean), _AXES)
    inv = lax.rsqrt(var + eps)
    return mean, var, inv


def _apply_act(y: jnp.ndarray, act: Optional[str]) -> jnp.ndarray:
    if act == "swish":
        return nn.swish(y)
    if act is None:
        return y
    raise ValueError(f"unknown act {act!r}")


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6))
def bn_act_train(x, scale, bias, eps, act, store, out_dtype):
    """(z, mean, var): train-mode BN(+act) with compressed-residual VJP."""
    xf = x.astype(jnp.float32)
    mean, var, inv = _stats(xf, eps)
    y = (xf - mean) * (inv * scale) + bias
    z = _apply_act(y.astype(out_dtype), act)
    return z, mean, var


def _fwd(x, scale, bias, eps, act, store, out_dtype):
    xf = x.astype(jnp.float32)
    mean, var, inv = _stats(xf, eps)
    y = (xf - mean) * (inv * scale) + bias
    z = _apply_act(y.astype(out_dtype), act)
    xhat = (xf - mean) * inv
    dt = jnp.zeros((), x.dtype)  # dtype witness (residual leaves are arrays)
    if store == "int8":
        amax = jnp.maximum(jnp.max(jnp.abs(xhat)), 1e-12)
        r = jnp.clip(jnp.round(xhat * (127.0 / amax)), -127, 127).astype(
            jnp.int8
        )
        res = (r, amax / 127.0, inv, scale, bias, dt)
    elif store == "bf16":
        res = (xhat.astype(jnp.bfloat16), None, inv, scale, bias, dt)
    else:
        raise ValueError(f"unknown store {store!r}")
    return (z, mean, var), res


def _bwd(eps, act, store, out_dtype, res, cts):
    gz, g_mean, g_var = cts
    r, r_scale, inv, scale, bias, dt = res
    xhat = r.astype(jnp.float32)
    if r_scale is not None:
        xhat = xhat * r_scale
    if act == "swish":
        # d swish(y)/dy at y reconstructed from x̂ — computed in f32, on
        # the same bf16-cast y the forward activated.
        y = (xhat * scale + bias).astype(out_dtype).astype(jnp.float32)
        s = jax.nn.sigmoid(y)
        dy = gz.astype(jnp.float32) * (s + y * s * (1.0 - s))
    else:
        dy = gz.astype(jnp.float32)
    n = 1
    for a in _AXES:
        n *= dy.shape[a]
    sum_dy = jnp.sum(dy, _AXES)
    sum_dy_xhat = jnp.sum(dy * xhat, _AXES)
    dscale = sum_dy_xhat
    dbias = sum_dy
    dx = (scale * inv) * (dy - sum_dy / n - xhat * (sum_dy_xhat / n))
    # cotangents of the (mean, var) outputs — zero in the trainer (running
    # stats are not differentiated) but included for correctness:
    # dmean/dx = 1/N, dvar/dx = 2(x-mean)/N = 2 x̂/(inv N).
    dx = dx + g_mean / n + g_var * (2.0 * xhat / (inv * n))
    return dx.astype(dt.dtype), dscale, dbias


bn_act_train.defvjp(_fwd, _bwd)


@jax.custom_vjp
def mul_q8(z, gate):
    """z * gate (SE excitation) whose backward reads z from int8.

    ``gate`` is the (B, 1, 1, C) sigmoid excitation — small either way;
    ``z`` is the full-resolution activation the standard VJP would keep in
    bf16 solely for d gate.
    """
    return z * gate


def _mul_fwd(z, gate):
    amax = jnp.maximum(jnp.max(jnp.abs(z.astype(jnp.float32))), 1e-12)
    r = jnp.clip(
        jnp.round(z.astype(jnp.float32) * (127.0 / amax)), -127, 127
    ).astype(jnp.int8)
    return z * gate, (r, amax / 127.0, gate, jnp.zeros((), z.dtype))


def _mul_bwd(res, go):
    r, r_scale, gate, dt = res
    zq = (r.astype(jnp.float32) * r_scale).astype(dt.dtype)
    dz = go * gate
    dgate = jnp.sum(
        (go * zq).astype(jnp.float32), axis=(1, 2), keepdims=True
    ).astype(gate.dtype)
    return dz, dgate


mul_q8.defvjp(_mul_fwd, _mul_bwd)


class FusedBNAct(nn.Module):
    """Drop-in for ``_bn(name, train)(x).astype(dtype)`` [+ ``nn.swish``].

    Parameter/collection names match flax BatchNorm (params scale/bias,
    batch_stats mean/var) so checkpoints are interchangeable with the
    standard path; give it the SAME module name the BatchNorm had.
    Train mode routes through :func:`bn_act_train`; eval mode is the plain
    running-stats normalize (identical to flax BatchNorm eval).
    """

    act: Optional[str] = "swish"
    store: str = "int8"
    epsilon: float = 1e-3
    momentum: float = 0.99
    out_dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x, train: bool):
        ch = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones, (ch,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros, (ch,), jnp.float32)
        ra_mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((ch,), jnp.float32)
        )
        ra_var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((ch,), jnp.float32)
        )
        if not train:
            xf = x.astype(jnp.float32)
            mul = lax.rsqrt(ra_var.value + self.epsilon) * scale
            y = (xf - ra_mean.value) * mul + bias
            return _apply_act(y.astype(self.out_dtype), self.act)
        z, mean, var = bn_act_train(
            x, scale, bias, self.epsilon, self.act, self.store, self.out_dtype
        )
        if not self.is_initializing():
            m = self.momentum
            ra_mean.value = m * ra_mean.value + (1.0 - m) * mean
            ra_var.value = m * ra_var.value + (1.0 - m) * var
        return z
