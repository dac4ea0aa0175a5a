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

    @nn.compact
    def __call__(self, x, train: bool):
        fold = self.bn_fold
        shortcut = x
        if self.projection:
            shortcut = nn.Conv(
                4 * self.filters, (1, 1), strides=self.stride, use_bias=True,
                dtype=self.dtype, name="proj_conv",
            )(x)
            if not fold:
                shortcut = _bn("proj_bn", train)(shortcut).astype(self.dtype)
        y = nn.Conv(
            self.filters, (1, 1), strides=self.stride, use_bias=True,
            dtype=self.dtype, name="conv1",
        )(x)
        if not fold:
            y = _bn("bn1", train)(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            self.filters, (3, 3), padding="SAME", use_bias=True,
            dtype=self.dtype, name="conv2",
        )(y)
        if not fold:
            y = _bn("bn2", train)(y).astype(self.dtype)
        y = nn.relu(y)
        y = nn.Conv(
            4 * self.filters, (1, 1), use_bias=True, dtype=self.dtype, name="conv3"
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

    @nn.compact
    def __call__(self, x, train: bool = False):
        if self.bn_fold and train:
            raise ValueError("bn_fold is an inference-only mode (train=False)")
        x = x.astype(self.dtype)
        x = nn.Conv(
            64, (7, 7), strides=2, padding=[(3, 3), (3, 3)], use_bias=True,
            dtype=self.dtype, name="stem_conv",
        )(x)
        if not self.bn_fold:
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
                    name=f"stage{stage + 2}_block{i}",
                )(x, train)
                if stage == 2 and i == self.c4_tap_block:
                    taps["c4_mid"] = x
            if stage == 0:
                taps["c2"] = x
            elif stage == 1:
                taps["c3"] = x
        return x, taps
