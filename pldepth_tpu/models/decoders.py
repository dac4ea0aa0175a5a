"""Depth-map decoders: skip-concat (EffNet) and ReDWeb feature-fusion.

Both re-derive the reference decoder topologies as Flax modules:

* :class:`SkipConcatDecoder` — the "fully fledged" EfficientNet decoder of
  pldepth/models/pl_hourglass.py:59-98: five conv/BN/ReLU + bilinear-x2
  stages, concatenating encoder expand-activation taps at 1/16, 1/8 and 1/4
  resolution, 1-channel conv head. Channel widths follow the tap widths
  (672/240/144/32/32 for B0 — scales automatically for wider variants).

* :class:`ReDWebDecoder` — the ResNet decoder of pldepth/models/redweb.py:
  402-434: three :class:`FeatureFusion` stages (225-290) over residual
  double-bottleneck blocks (67-183) plus an :class:`AdaptiveOutput` head
  (293-351).

Upsampling is bilinear with TF half-pixel semantics (ops/resize.py).
"""

from __future__ import annotations

from typing import Any, Sequence

import flax.linen as nn
import jax.numpy as jnp

from pldepth_tpu.ops.fused_tail import fused_upsample2x_head
from pldepth_tpu.ops.resize import upsample2x_bilinear
from pldepth_tpu.ops.sparse_tail import sparse_upsample2x_taps


def _bn(name: str, train: bool):
    # use_fast_variance=False: two-pass variance matching tf.nn.moments
    # (see models/efficientnet.py _bn for the parity rationale)
    return nn.BatchNorm(
        use_running_average=not train, momentum=0.99, epsilon=1e-3,
        dtype=jnp.float32, use_fast_variance=False, name=name,
    )


class _ConvParams(nn.Module):
    """Owns the kernel/bias of a conv without applying it, with the same
    parameter names, shapes and initializers as ``nn.Conv`` — so the fused
    tail shares one parameter tree (``decoder/head``) with the unfused and
    sparse paths and checkpoints are interchangeable."""

    features: int
    kernel_size: tuple
    in_features: int

    @nn.compact
    def __call__(self):
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(),
            (*self.kernel_size, self.in_features, self.features),
        )
        bias = self.param("bias", nn.initializers.zeros, (self.features,))
        return kernel, bias


class SkipConcatDecoder(nn.Module):
    """(top 1/32, taps expand_6/4/3) -> full-resolution 1-channel depth map.

    With ``pixels`` (B, N, 2) int32 full-res (row, col) coordinates, the
    final upsample + head conv run sparsely at those pixels only
    (ops/sparse_tail.py) and the output is (B, N) depths. Everything through
    the last BatchNorm stays dense, so batch statistics and their gradients
    match the dense path exactly; both paths create identical parameters.
    """

    head_ch: int = 32
    dtype: Any = jnp.bfloat16
    fused_tail: bool = True
    # inference-only: BN pre-folded into biased convs (models/bn_fold.py)
    bn_fold: bool = False
    # inference-only: int8 serving / calibration (models/quantize.py);
    # the 1-channel head conv stays bf16 for output quality
    quant: Any = False

    @nn.compact
    def __call__(self, top, taps, train: bool = False, pixels=None):
        from pldepth_tpu.models.quantize import make_conv

        fold = self.bn_fold or bool(self.quant)

        def conv_bn_relu_up(x, ch, idx):
            x = make_conv(
                self.quant, self.dtype, ch, (3, 3), f"conv{idx}"
            )(x)
            if not fold:
                x = _bn(f"bn{idx}", train)(x).astype(self.dtype)
            x = nn.relu(x)
            return upsample2x_bilinear(x)

        x = conv_bn_relu_up(top, taps["expand_6"].shape[-1], 0)  # -> 1/16
        x = jnp.concatenate([x, taps["expand_6"]], axis=-1)
        x = conv_bn_relu_up(x, taps["expand_4"].shape[-1], 1)  # -> 1/8
        x = jnp.concatenate([x, taps["expand_4"]], axis=-1)
        x = conv_bn_relu_up(x, taps["expand_3"].shape[-1], 2)  # -> 1/4
        x = jnp.concatenate([x, taps["expand_3"]], axis=-1)
        x = conv_bn_relu_up(x, self.head_ch, 3)  # -> 1/2
        # stage 4 unrolled (conv4/bn4/relu at 1/2) so the tail can go sparse
        x = make_conv(
            self.quant, self.dtype, self.head_ch, (3, 3), "conv4"
        )(x)
        if not fold:
            x = _bn("bn4", train)(x).astype(self.dtype)
        x = nn.relu(x)
        if pixels is None and self.fused_tail:
            # Fused tail: upsample+head collapsed into a half-res phase conv
            # (ops/fused_tail.py) — same parameters, same values (to compute-
            # dtype rounding), ~10 ms/step less full-res traffic at 448^2.
            # NOTE: fusing conv4's preceding upsample the same way
            # (fused_upsample2x_conv at 1/4 res) was measured SLOWER on chip
            # (serving 25.4 vs 22.5 ms): at 32 channels the exact border
            # patch's slice+concat of the 224^2 tensor costs more than the
            # avoided resize — the 1-channel head is the only tail stage
            # where the patch is near-free. See docs/BENCH.md.
            kernel, bias = _ConvParams(
                1, (3, 3), x.shape[-1], name="head"
            )()
            return fused_upsample2x_head(x, kernel, bias).astype(jnp.float32)
        head = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="head")
        if pixels is None:
            x = upsample2x_bilinear(x)  # -> 1/1
            return head(x).astype(jnp.float32)
        tap = sparse_upsample2x_taps(x, pixels, window=3)  # (B, N, 3, 3, C)
        b, n = tap.shape[:2]
        out = head(tap.reshape(b * n, 3, 3, tap.shape[-1]))[:, 1, 1, 0]
        return out.reshape(b, n).astype(jnp.float32)


class ResidualBottleneckPair(nn.Module):
    """Two chained residual bottleneck units at constant width
    (reference BottleneckConvLayer, redweb.py:67-183)."""

    ch: int
    dtype: Any = jnp.bfloat16
    bn_fold: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, x, train: bool):
        from pldepth_tpu.models.quantize import make_conv

        fold = self.bn_fold or bool(self.quant)
        for u in range(2):
            res = x
            y = make_conv(
                self.quant, self.dtype, self.ch // 4, (1, 1), f"u{u}_conv0",
                use_bias=fold,
            )(x)
            if not fold:
                y = _bn(f"u{u}_bn0", train)(y).astype(self.dtype)
            y = nn.relu(y)
            y = make_conv(
                self.quant, self.dtype, self.ch // 4, (3, 3), f"u{u}_conv1",
                use_bias=fold,
            )(y)
            if not fold:
                y = _bn(f"u{u}_bn1", train)(y).astype(self.dtype)
            y = nn.relu(y)
            y = make_conv(
                self.quant, self.dtype, self.ch, (1, 1), f"u{u}_conv2",
                use_bias=fold,
            )(y)
            if not fold:
                y = _bn(f"u{u}_bn2", train)(y).astype(self.dtype)
            x = nn.relu(y + res)
        return x


class FeatureFusion(nn.Module):
    """Fuse a lateral encoder tap with the upsampled decoder path
    (reference FeatureFusionLayer, redweb.py:225-290)."""

    ch: int
    dtype: Any = jnp.bfloat16
    bn_fold: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, lateral, up, train: bool):
        from pldepth_tpu.models.quantize import make_conv

        fold = self.bn_fold or bool(self.quant)
        left = make_conv(
            self.quant, self.dtype, self.ch, (3, 3), "lateral_conv",
            use_bias=fold,
        )(lateral)
        if not fold:
            left = _bn("lateral_bn", train)(left).astype(self.dtype)
        left = ResidualBottleneckPair(
            self.ch, dtype=self.dtype, bn_fold=self.bn_fold,
            quant=self.quant, name="lateral_block"
        )(left, train)
        top = make_conv(
            self.quant, self.dtype, self.ch, (3, 3), "up_conv",
            use_bias=fold,
        )(up)
        if not fold:
            top = _bn("up_bn", train)(top).astype(self.dtype)
        x = left + top
        x = ResidualBottleneckPair(
            self.ch, dtype=self.dtype, bn_fold=self.bn_fold,
            quant=self.quant, name="fuse_block"
        )(x, train)
        return upsample2x_bilinear(x)


class AdaptiveOutput(nn.Module):
    """Depth head (reference AdaptiveOutputLayer, redweb.py:293-351).

    With ``pixels``, the final upsample + 1x1 conv run sparsely (the 1x1
    conv needs a single bilinear tap per pixel) and the output is (B, N).
    """

    dtype: Any = jnp.bfloat16
    bn_fold: bool = False
    # quant: conv0 goes int8; conv1/conv2 (the 1-channel head pair) stay
    # bf16 for output quality, mirroring SkipConcatDecoder's head policy
    quant: Any = False

    @nn.compact
    def __call__(self, x, train: bool, pixels=None):
        from pldepth_tpu.models.quantize import make_conv

        x = make_conv(self.quant, self.dtype, 64, (3, 3), "conv0")(x)
        if not (self.bn_fold or self.quant):
            x = _bn("bn0", train)(x).astype(self.dtype)
        x = nn.relu(x)
        x = nn.Conv(1, (3, 3), padding="SAME", dtype=self.dtype, name="conv1")(x)
        out = nn.Conv(1, (1, 1), dtype=self.dtype, name="conv2")
        if pixels is None:
            return out(upsample2x_bilinear(x)).astype(jnp.float32)
        tap = sparse_upsample2x_taps(x, pixels, window=1)  # (B, N, 1, 1, 1)
        b, n = tap.shape[:2]
        val = out(tap.reshape(b * n, 1, 1, 1))[:, 0, 0, 0]
        return val.reshape(b, n).astype(jnp.float32)


class ReDWebDecoder(nn.Module):
    """(c5 1/32, taps c4_mid/c3/c2) -> full-resolution 1-channel depth map."""

    fusion_ch: Sequence[int] = (256, 128, 64)
    dtype: Any = jnp.bfloat16
    bn_fold: bool = False
    quant: Any = False

    @nn.compact
    def __call__(self, c5, taps, train: bool = False, pixels=None):
        if (self.bn_fold or self.quant) and train:
            raise ValueError("bn_fold is an inference-only mode (train=False)")
        x = upsample2x_bilinear(c5)  # 1/32 -> 1/16
        for i, name in enumerate(("fusion0", "fusion1", "fusion2")):
            x = FeatureFusion(
                self.fusion_ch[i], dtype=self.dtype, bn_fold=self.bn_fold,
                quant=self.quant, name=name,
            )(taps[("c4_mid", "c3", "c2")[i]], x, train)  # 1/16->1/8->1/4->1/2
        return AdaptiveOutput(
            dtype=self.dtype, bn_fold=self.bn_fold, quant=self.quant,
            name="output"
        )(x, train, pixels)  # -> 1/1
