"""Post-training int8 quantization for TPU serving (``--quantize int8``).

The v5e MXU runs int8 at ~2x its bf16 rate and this chip measures int8
convs (dense AND depthwise) at ~3x bf16 (docs/BENCH.md round-3 probes), so
the serving forward gets both a compute and an HBM-bytes win by running
every large conv in int8. The reference has no quantized path (TF2 fp32
serving, pldepth/test_data_eval.py:70-85); this is a TPU-native capability
in the same spirit as models/bn_fold.py.

Scheme — symmetric, static, per-channel weights / per-tensor activations:

* Start from the BN-folded inference graph (models/bn_fold.py): every
  conv is a biased conv, so quantization composes with the serving default.
* Weights: per-output-channel symmetric int8,
  ``w_scale[c] = max|W[..., c]| / 127``; bias stays float32.
* Activations: per-tensor symmetric int8 with a *calibrated* static scale
  ``a_scale = amax / 127``, where ``amax`` is the max |input| observed over
  calibration batches run through the same graph in calibrate mode
  (weights already dequantized-from-int8, so weight error is included).
* Zero-point is 0 everywhere, so SAME zero-padding is exact in the int8
  domain and the conv accumulates in int32 on the MXU
  (``preferred_element_type=int32``).
* Kept in float/bf16: squeeze-excite (tiny 1x1s on pooled vectors), the
  1-channel head conv (output quality; it reads only the 1/2-res 32-ch
  tensor), swish/relu/sigmoid epilogues (f32/bf16), the bilinear
  upsamples, and — since round 4 — *depthwise activations* (int8 weights,
  bf16 conv: XLA TPU miscompiles fused depthwise int8 convs and the safe
  int32 barrier costs -31%; see the grouped-conv branch in QuantConv).
  The quantize(round/clip) op fuses into the producing epilogue under
  XLA, so inter-conv tensors cross HBM as int8.

Flow: ``quantize_variables(variables, model_name, calib_module, calib_fn)``
folds BN, packs each targeted conv into ``{kernel_q, w_scale, bias,
a_scale}``, runs calibration forwards that ``sow`` per-conv input maxima
into the ``quant_calib`` collection, and writes the resulting scales. The
returned tree drives the ``quant="int8"`` module mode.
"""

from __future__ import annotations

from typing import Any, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp
from jax import lax

from pldepth_tpu.models.bn_fold import fold_variables

_Q_KEYS = {"kernel_q", "w_scale", "bias", "a_scale"}


class QuantConv(nn.Module):
    """Biased conv in int8 (quant mode) or dequantized bf16 (calibrate mode).

    Parameter names are stable across both modes so one tree serves both:
    ``kernel_q`` int8 (H, W, Cin/groups, Cout), ``w_scale`` (Cout,) f32,
    ``bias`` (Cout,) f32, ``a_scale`` () f32.
    """

    features: int
    kernel_size: Tuple[int, int]
    strides: int = 1
    padding: Any = "SAME"  # str or explicit ((lo, hi), (lo, hi))
    feature_group_count: int = 1
    calibrate: bool = False
    dtype: Any = jnp.bfloat16

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1] // self.feature_group_count
        kernel_q = self.param(
            "kernel_q",
            nn.initializers.zeros,
            (*self.kernel_size, in_ch, self.features),
            jnp.int8,
        )
        w_scale = self.param(
            "w_scale", nn.initializers.ones, (self.features,), jnp.float32
        )
        bias = self.param(
            "bias", nn.initializers.zeros, (self.features,), jnp.float32
        )
        a_scale = self.param(
            "a_scale", nn.initializers.ones, (), jnp.float32
        )
        dn = ("NHWC", "HWIO", "NHWC")
        strides = (self.strides, self.strides)
        if self.calibrate:
            self.sow(
                "quant_calib",
                "amax",
                jnp.max(jnp.abs(x.astype(jnp.float32))),
                init_fn=lambda: jnp.zeros((), jnp.float32),
                reduce_fn=jnp.maximum,
            )
            w = (kernel_q.astype(jnp.float32) * w_scale).astype(self.dtype)
            y = lax.conv_general_dilated(
                x.astype(self.dtype), w, strides, self.padding,
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
            )
            return (y.astype(jnp.float32) + bias).astype(self.dtype)
        # Quantize + dequantize in compute dtype (bf16), not f32: integers
        # up to 256 are exact in bf16 so the rounding is sound, and the f32
        # variant measured +67% HBM bytes on the whole graph (f32 epilogue
        # tensors materialize around every int32 conv output) — the bf16
        # epilogue is what makes int8 serving a net win. docs/BENCH.md.
        inv = (1.0 / a_scale).astype(self.dtype)
        if self.feature_group_count > 1:
            # Depthwise sites run int8-WEIGHT / bf16-activation. Two
            # reasons (round-4 metric gate, 2026-08-21):
            # 1. XLA TPU miscompiles depthwise int8 convs when the
            #    int32->bf16 convert + scale multiply fuses into the conv
            #    (float-accumulation emitter emits NaN/garbage; fires
            #    context-dependently — full model broken at 448^2, fine at
            #    64/224; standalone broken at every size; CPU always fine;
            #    tools/probe_qconv_sizes.py reproduces). It collapsed the
            #    trained 448^2 model to pearson 0.002 vs float.
            # 2. The safe workaround (optimization_barrier on the int32
            #    result) materializes a full-res int32 tensor and measured
            #    670.6 img/s vs 971.8 bn_fold (-31%). The bf16 depthwise
            #    keeps the serving win (measured back-to-back post-fix,
            #    docs/BENCH.md) and removes dw activation-quant error
            #    entirely; dw FLOPs are trivial, so only its input-read
            #    bytes (2B vs 1B) are paid.
            w = (kernel_q.astype(jnp.float32) * w_scale).astype(self.dtype)
            y = lax.conv_general_dilated(
                x.astype(self.dtype), w, strides, self.padding,
                dimension_numbers=dn,
                feature_group_count=self.feature_group_count,
            )
            return y + bias.astype(self.dtype)
        # Dequantize with the *same* bf16-rounded reciprocal used to
        # quantize (1/inv), not the f32 a_scale: the two differ by bf16
        # rounding (~0.4% systematic scale error on top of the intended
        # int8 rounding) — with a_eff the only remaining error is int8
        # rounding itself.
        a_eff = 1.0 / inv.astype(jnp.float32)
        q = jnp.clip(
            jnp.round(x.astype(self.dtype) * inv), -127, 127
        ).astype(jnp.int8)
        if self._use_pallas(q):
            from pldepth_tpu.ops.quant_matmul import quant_matmul

            b, h, w_, c = q.shape
            out2d = quant_matmul(
                q.reshape(b * h * w_, c),
                kernel_q.reshape(c, self.features),
                w_scale, bias, a_eff, out_dtype=self.dtype,
            )
            return out2d.reshape(b, h, w_, self.features)
        y = lax.conv_general_dilated(
            q, kernel_q, strides, self.padding,
            dimension_numbers=dn,
            feature_group_count=self.feature_group_count,
            preferred_element_type=jnp.int32,
        )
        out = y.astype(self.dtype) * (a_eff * w_scale).astype(self.dtype)
        return out + bias.astype(self.dtype)

    def _use_pallas(self, q) -> bool:
        """Opt-in (PLDEPTH_QUANT_PALLAS=1): route fat-contraction 1x1 convs
        to the Pallas fused int8 matmul (ops/quant_matmul.py). Standalone
        the kernel beats the XLA int8 conv 2.07x at (100352, 672, 112), but
        routed in-graph the whole serving forward measured 1019 vs 1045
        img/s (per-call dispatch + lost epilogue fusions outweigh the saved
        int32 round-trips) — same verdict as the fused MBConv encoder, so
        OFF by default; see docs/BENCH.md. Thin-K shapes lose even
        standalone (gated on K); TPU only (Mosaic kernel)."""
        import os

        from pldepth_tpu.ops.quant_matmul import (
            QUANT_PALLAS_MIN_K, pick_tile_m,
        )

        b, h, w_, c = q.shape
        return (
            os.environ.get("PLDEPTH_QUANT_PALLAS", "0") == "1"
            and self.kernel_size == (1, 1)
            and self.strides == 1
            and self.feature_group_count == 1
            and c >= QUANT_PALLAS_MIN_K
            and pick_tile_m(b * h * w_) is not None
            and jax.default_backend() == "tpu"
        )


def make_conv(
    quant, dtype, features, kernel_size, name, *, strides=1, groups=1,
    use_bias=True, padding="SAME",
):
    """Conv factory the model modules call at every quantization-eligible
    site: plain ``nn.Conv`` normally, :class:`QuantConv` under ``quant``
    ("int8" serving mode or "calib" calibration mode)."""
    if quant:
        return QuantConv(
            features=features, kernel_size=tuple(kernel_size),
            strides=strides, padding=padding, feature_group_count=groups,
            calibrate=(quant == "calib"), dtype=dtype, name=name,
        )
    return nn.Conv(
        features, tuple(kernel_size), strides=strides, padding=padding,
        use_bias=use_bias, feature_group_count=groups, dtype=dtype,
        name=name,
    )


def _is_quant_site(node: Any) -> bool:
    return isinstance(node, dict) and set(node) == _Q_KEYS


def _pack_params(q_template: Dict, folded: Dict, path: str = "") -> Dict:
    """Fill a quant-mode param template from BN-folded float params.

    Structure-driven: wherever the template has a QuantConv leaf-set, the
    folded tree has ``{kernel, bias}`` at the same path; everything else
    copies through by path.
    """
    out = {}
    for key, node in q_template.items():
        here = f"{path}/{key}"
        if _is_quant_site(node):
            src = folded.get(key)
            if not isinstance(src, dict) or "kernel" not in src:
                raise ValueError(f"no folded conv at {here!r} to quantize")
            w = jnp.asarray(src["kernel"], jnp.float32)
            w_scale = jnp.maximum(
                jnp.max(jnp.abs(w), axis=tuple(range(w.ndim - 1))), 1e-12
            ) / 127.0
            out[key] = {
                "kernel_q": jnp.clip(
                    jnp.round(w / w_scale), -127, 127
                ).astype(jnp.int8),
                "w_scale": w_scale,
                "bias": jnp.asarray(
                    src.get("bias", jnp.zeros(w.shape[-1])), jnp.float32
                ),
                "a_scale": jnp.ones((), jnp.float32),
            }
        elif isinstance(node, dict):
            if key not in folded:
                raise ValueError(f"missing folded subtree at {here!r}")
            out[key] = _pack_params(node, folded[key], here)
        else:
            out[key] = folded[key]
    return out


def _write_scales(params: Dict, calib: Dict) -> Dict:
    """Write calibrated a_scale values (amax/127) into the packed tree."""
    out = dict(params)
    for key, node in calib.items():
        if key == "amax":
            # `params` here is the QuantConv site itself
            amax = jnp.asarray(node, jnp.float32).max()
            out["a_scale"] = jnp.maximum(amax, 1e-12) / 127.0
        elif isinstance(node, dict):
            out[key] = _write_scales(params[key], node)
    return out


def quantize_variables(
    variables: Dict,
    model_name: str,
    calib_module: nn.Module,
    calib_batches,
) -> Dict:
    """Trained variables + calibration batches -> int8 serving variables.

    ``calib_module`` is the model cloned with ``quant="calib"``;
    ``calib_batches`` yields normalized image batches (same preprocessing
    as serving). Returns ``{"params": ...}`` for the ``quant="int8"``
    module.
    """
    folded = fold_variables(variables, model_name)["params"]
    template = jax.eval_shape(
        lambda: calib_module.init(
            jax.random.key(0),
            jnp.zeros((1, 64, 64, 3), jnp.float32),
            False,
        )
    )["params"]
    packed = _pack_params(template, folded)

    apply = jax.jit(
        lambda p, x: calib_module.apply(
            {"params": p}, x, False, mutable=["quant_calib"]
        )[1]["quant_calib"]
    )
    amax = None
    for batch in calib_batches:
        cur = apply(packed, jnp.asarray(batch, jnp.float32))
        amax = cur if amax is None else jax.tree.map(jnp.maximum, amax, cur)
    if amax is None:
        raise ValueError("quantize_variables needs >=1 calibration batch")
    return {"params": _write_scales(packed, jax.device_get(amax))}
