"""ResNet-50 encoder in Flax with ReDWeb decoder feature taps.

From-scratch replacement for the ``keras.applications.ResNet50`` encoder the
reference uses for its ReDWeb-style model (pldepth/models/redweb.py:409-421).
The reference taps four activations: conv2_block3_out (1/4, 256ch),
conv3_block4_out (1/8, 512ch), conv4_block3_out (1/16, 1024ch — note: block 3
of 6, a mid-stage tap) and conv5_block3_out (1/32, 2048ch). Tap indices are
configurable; defaults reproduce those.

Keras-v1 bottleneck convention: the stride-2 sits on the first 1x1 conv of
each downsampling block; BN epsilon 1.001e-5. NHWC, bf16 compute, fp32 BN.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp


def _bn(name: str, train: bool):
    # use_fast_variance=False: two-pass variance matching tf.nn.moments
    # (see models/efficientnet.py _bn for the parity rationale)
    return nn.BatchNorm(
        use_running_average=not train,
        momentum=0.99,
        epsilon=1.001e-5,
        dtype=jnp.float32,
        use_fast_variance=False,
        name=name,
    )


class Bottleneck(nn.Module):
    filters: int  # inner width; output is 4*filters
    stride: int = 1
    projection: bool = False
    dtype: Any = jnp.bfloat16
    bn_fold: bool = False
    # inference-only: int8 serving / calibration (models/quantize.py)
    quant: Any = False

    @nn.compact
    def __call__(self, x, train: bool):
        from pldepth_tpu.models.quantize import make_conv

        fold = self.bn_fold or bool(self.quant)
        shortcut = x
        if self.projection:
            shortcut = make_conv(
                self.quant, self.dtype, 4 * self.filters, (1, 1),
                "proj_conv", strides=self.stride,
            )(x)
            if not fold:
                shortcut = _bn("proj_bn", train)(shortcut).astype(self.dtype)
        y = make_conv(
            self.quant, self.dtype, self.filters, (1, 1), "conv1",
            strides=self.stride,
        )(x)
        if not fold:
            y = _bn("bn1", train)(y).astype(self.dtype)
        y = nn.relu(y)
        y = make_conv(
            self.quant, self.dtype, self.filters, (3, 3), "conv2"
        )(y)
        if not fold:
            y = _bn("bn2", train)(y).astype(self.dtype)
        y = nn.relu(y)
        y = make_conv(
            self.quant, self.dtype, 4 * self.filters, (1, 1), "conv3"
        )(y)
        if not fold:
            y = _bn("bn3", train)(y).astype(self.dtype)
        return nn.relu(y + shortcut)


class ResNet50Encoder(nn.Module):
    """Returns (c5, taps) with taps {"c2": 1/4, "c3": 1/8, "c4_mid": 1/16}."""

    dtype: Any = jnp.bfloat16
    stage_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    # block index (0-based, per stage) after which the 1/16 tap is taken;
    # reference taps conv4_block3_out => index 2 of stage 4.
    c4_tap_block: int = 2
    bn_fold: bool = False
    # inference-only: int8 serving / calibration (models/quantize.py)
    quant: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False):
        from pldepth_tpu.models.quantize import make_conv

        if (self.bn_fold or self.quant) and train:
            raise ValueError("bn_fold is an inference-only mode (train=False)")
        fold = self.bn_fold or bool(self.quant)
        x = x.astype(self.dtype)
        x = make_conv(
            self.quant, self.dtype, 64, (7, 7), "stem_conv", strides=2,
            padding=((3, 3), (3, 3)),
        )(x)
        if not fold:
            x = _bn("stem_bn", train)(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        taps: Dict[str, jax.Array] = {}
        filters = (64, 128, 256, 512)
        for stage in range(4):
            blocks = self.stage_blocks[stage]
            for i in range(blocks):
                x = Bottleneck(
                    filters=filters[stage],
                    stride=2 if (i == 0 and stage > 0) else 1,
                    projection=(i == 0),
                    dtype=self.dtype,
                    bn_fold=self.bn_fold,
                    quant=self.quant,
                    name=f"stage{stage + 2}_block{i}",
                )(x, train)
                if stage == 2 and i == self.c4_tap_block:
                    taps["c4_mid"] = x
            if stage == 0:
                taps["c2"] = x
            elif stage == 1:
                taps["c3"] = x
        return x, taps
