"""EfficientNet encoder family (B0..B7) in Flax, with decoder feature taps.

From-scratch TPU-first implementation of the encoder the reference pulls in
as ``keras.applications.EfficientNetB0`` (pldepth/models/pl_hourglass.py:48).
The reference taps three intermediate activations for its decoder skip
connections — the *expansion-conv activations* of the first block of stages
3, 4 and 6 ("block3a/4a/6a_expand_activation",
pldepth/models/pl_hourglass.py:65,74,83), at 1/4, 1/8 and 1/16 input
resolution — plus the final 1280-channel top activation at 1/32. This module
returns exactly those taps.

TPU-first choices: NHWC layout (XLA-native conv layout on TPU), bfloat16
compute with float32 params and float32 batch-norm, compile-time static
architecture (the width/depth scaling resolves at trace time), optional
``jax.checkpoint`` rematerialization per stage.
"""

from __future__ import annotations

import math
from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

# (expand_ratio, channels, repeats, stride, kernel) for B0, per stage 1..7.
_STAGE_DEFS = (
    (1, 16, 1, 1, 3),
    (6, 24, 2, 2, 3),
    (6, 40, 2, 2, 5),
    (6, 80, 3, 2, 3),
    (6, 112, 3, 1, 5),
    (6, 192, 4, 2, 5),
    (6, 320, 1, 1, 3),
)

# width_coefficient, depth_coefficient (resolution is caller-chosen)
VARIANTS: Dict[str, Tuple[float, float]] = {
    # "smoke" is NOT a reference variant: a 7-block, 8-80-channel scaling of
    # the same topology (every stage, tap and decoder wire intact) whose
    # train step compiles in seconds — for CI / bring-up / trainer-mechanics
    # tests where the B0 compile (minutes on a small host) buys no coverage.
    "smoke": (0.25, 0.25),
    "b0": (1.0, 1.0),
    "b1": (1.0, 1.1),
    "b2": (1.1, 1.2),
    "b3": (1.2, 1.4),
    "b4": (1.4, 1.8),
    "b5": (1.6, 2.2),
    "b6": (1.8, 2.6),
    "b7": (2.0, 3.1),
}

# stages whose first-block expand activation feeds the decoder, and the
# resolution (fraction of input) of each tap
DECODER_TAP_STAGES = (3, 4, 6)


def round_filters(filters: int, width: float, divisor: int = 8) -> int:
    filters *= width
    new = max(divisor, int(filters + divisor / 2) // divisor * divisor)
    if new < 0.9 * filters:
        new += divisor
    return int(new)


def round_repeats(repeats: int, depth: float) -> int:
    return int(math.ceil(depth * repeats))


class SqueezeExcite(nn.Module):
    reduce_ch: int
    dtype: Any = jnp.bfloat16
    # "int8": the excitation multiply reads x from an int8 residual in
    # backward (ops/qres.py mul_q8) — x is otherwise kept in bf16 solely
    # for d(gate)
    qres: Any = None

    @nn.compact
    def __call__(self, x):
        se = jnp.mean(x.astype(jnp.float32), axis=(1, 2), keepdims=True)
        se = nn.Conv(self.reduce_ch, (1, 1), dtype=self.dtype, name="reduce")(
            se.astype(self.dtype)
        )
        se = nn.swish(se)
        se = nn.Conv(x.shape[-1], (1, 1), dtype=self.dtype, name="expand")(se)
        gate = jax.nn.sigmoid(se.astype(jnp.float32)).astype(x.dtype)
        if self.qres == "int8":
            from pldepth_tpu.ops.qres import mul_q8

            return mul_q8(x, gate)
        return x * gate


def _bn(name: str, train: bool):
    # float32 batch-norm (stats and affine in fp32) under bf16 compute.
    # use_fast_variance=False = two-pass E[(x-mean)^2], matching tf.nn.moments
    # (Keras BN); the fast E[x^2]-mean^2 form loses ~3 decimal digits to
    # cancellation when |mean| >> std, which broke train-mode parity vs TF.
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.99,
        epsilon=1e-3,
        dtype=jnp.float32,
        use_fast_variance=False,
        name=name,
    )


def _bn_act(qres, name, train, dtype, act):
    """BN followed by an optional activation, as one callable.

    Standard path: flax BatchNorm (above) then swish in compute dtype.
    Under ``qres`` ("int8"/"bf16"): ops/qres.py FusedBNAct — same forward
    math and the same param/batch_stats names (checkpoint-compatible), but
    the backward residual is stored compressed.
    """
    if qres:
        from pldepth_tpu.ops.qres import FusedBNAct

        mod = FusedBNAct(act=act, store=qres, out_dtype=dtype, name=name)
        return lambda x: mod(x, train)

    def f(x):
        y = _bn(name, train)(x).astype(dtype)
        return nn.swish(y) if act == "swish" else y

    return f


class MBConv(nn.Module):
    """Mobile inverted bottleneck with SE; optionally emits its expand tap."""

    in_ch: int
    out_ch: int
    expand: int
    kernel: int
    stride: int
    se_ratio: float = 0.25
    drop_rate: float = 0.0
    dtype: Any = jnp.bfloat16
    # inference-only: BN pre-folded into biased convs (models/bn_fold.py)
    bn_fold: bool = False
    # inference-only: int8 convs ("int8") or calibration pass ("calib");
    # implies bn_fold trees (models/quantize.py)
    quant: Any = False
    # compressed-residual training ("int8"/"bf16", ops/qres.py)
    qres: Any = None

    @nn.compact
    def __call__(self, x, train: bool):
        from pldepth_tpu.models.quantize import make_conv

        inputs = x
        expand_act = None
        fold = self.bn_fold or bool(self.quant)  # quant trees are BN-folded
        if self.expand != 1:
            x = make_conv(
                self.quant, self.dtype, self.in_ch * self.expand, (1, 1),
                "expand_conv", use_bias=fold,
            )(x)
            if not fold:
                x = _bn_act(self.qres, "expand_bn", train, self.dtype,
                            "swish")(x)
            else:
                x = nn.swish(x)
            expand_act = x  # "blockXa_expand_activation" tap point
        k = self.kernel
        x = make_conv(
            self.quant, self.dtype, x.shape[-1], (k, k), "dw_conv",
            strides=self.stride, groups=x.shape[-1], use_bias=fold,
        )(x)
        if not fold:
            x = _bn_act(self.qres, "dw_bn", train, self.dtype, "swish")(x)
        else:
            x = nn.swish(x)
        if self.se_ratio > 0:
            x = SqueezeExcite(
                max(1, int(self.in_ch * self.se_ratio)), dtype=self.dtype,
                qres=self.qres, name="se"
            )(x)
        x = make_conv(
            self.quant, self.dtype, self.out_ch, (1, 1), "project_conv",
            use_bias=fold,
        )(x)
        if not fold:
            x = _bn_act(self.qres, "project_bn", train, self.dtype, None)(x)
        if self.stride == 1 and self.in_ch == self.out_ch:
            if self.drop_rate > 0 and train:
                keep = 1.0 - self.drop_rate
                rng = self.make_rng("droppath")
                mask = jax.random.bernoulli(rng, keep, (x.shape[0], 1, 1, 1))
                x = jnp.where(mask, x / keep, 0.0).astype(x.dtype)
            x = x + inputs
        return x, expand_act


class EfficientNetEncoder(nn.Module):
    """Returns ``(top, taps)``: the 1/32 top activation and decoder taps.

    taps = {"expand_3": 1/4 res, "expand_4": 1/8, "expand_6": 1/16}.
    """

    variant: str = "b0"
    drop_connect_rate: float = 0.2
    dtype: Any = jnp.bfloat16
    # inference-only: BN pre-folded into biased convs (models/bn_fold.py)
    bn_fold: bool = False
    # inference-only: int8 serving / calibration (models/quantize.py)
    quant: Any = False
    # compressed-residual training ("int8"/"bf16", ops/qres.py)
    qres: Any = None

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pldepth_tpu.models.quantize import make_conv

        if (self.bn_fold or self.quant) and train:
            raise ValueError("bn_fold is an inference-only mode (train=False)")
        fold = self.bn_fold or bool(self.quant)
        width, depth = VARIANTS[self.variant]
        x = x.astype(self.dtype)

        x = make_conv(
            self.quant, self.dtype, round_filters(32, width), (3, 3),
            "stem_conv", strides=2, use_bias=fold,
        )(x)
        if not fold:
            x = _bn_act(self.qres, "stem_bn", train, self.dtype, "swish")(x)
        else:
            x = nn.swish(x)

        taps: Dict[str, jax.Array] = {}
        total_blocks = sum(round_repeats(r, depth) for (_, _, r, _, _) in _STAGE_DEFS)
        block_idx = 0
        in_ch = round_filters(32, width)
        for stage_num, (expand, ch, repeats, stride, kernel) in enumerate(
            _STAGE_DEFS, start=1
        ):
            out_ch = round_filters(ch, width)
            for i in range(round_repeats(repeats, depth)):
                # remat (if requested) is applied at the train-step level via
                # jax.checkpoint policies; blocks stay plain modules here.
                blk = MBConv(
                    in_ch=in_ch,
                    out_ch=out_ch,
                    expand=expand,
                    kernel=kernel,
                    stride=stride if i == 0 else 1,
                    drop_rate=self.drop_connect_rate * block_idx / total_blocks,
                    dtype=self.dtype,
                    bn_fold=self.bn_fold,
                    quant=self.quant,
                    qres=self.qres,
                    name=f"stage{stage_num}_block{i}",
                )
                x, expand_act = blk(x, train)
                if i == 0 and stage_num in DECODER_TAP_STAGES:
                    taps[f"expand_{stage_num}"] = expand_act
                in_ch = out_ch
                block_idx += 1

        x = make_conv(
            self.quant, self.dtype, round_filters(1280, width), (1, 1),
            "top_conv", use_bias=fold,
        )(x)
        if not fold:
            x = _bn_act(self.qres, "top_bn", train, self.dtype, "swish")(x)
        else:
            x = nn.swish(x)
        return x, taps
