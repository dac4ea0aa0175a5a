"""Model factory: fully-fledged depth networks + parameter partitioning.

Replaces the reference factory ``get_pl_depth_net``
(pldepth/models/PLDepthNet.py:6-21) and model-type lookup
(pldepth/models/models_meta.py:13-24). Extends the family with scaled
EfficientNet variants (``ff_effnet_b4`` for the v5e-16 pretrain config in
BASELINE.md) while preserving the reference names ``ff_effnet`` /
``ff_redweb``.

Encoder freezing: the reference freezes every encoder layer except
BatchNorm (pl_hourglass.py:53-57, redweb.py:412-416). Here that is a
*parameter partition*: :func:`partition_params` labels each param "frozen" or
"trainable" so the optimizer applies zero updates to frozen leaves
(train/trainer.py uses optax.multi_transform). BN running statistics always
update.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Dict, Tuple

import flax.linen as nn
import jax
import jax.numpy as jnp

from pldepth_tpu.models.decoders import ReDWebDecoder, SkipConcatDecoder
from pldepth_tpu.models.efficientnet import VARIANTS, EfficientNetEncoder
from pldepth_tpu.models.resnet import ResNet50Encoder


class EffNetFullyFledged(nn.Module):
    """EfficientNet encoder + skip-concat decoder -> (B, H, W, 1) depth.

    HR-WSI depth convention: output is *descending* depth order (higher =
    closer; reference pl_hourglass.py:22-31 ``asc_depth_order=False``).

    ``remat``: rematerialize the encoder in the backward pass (trade FLOPs
    for activation memory — for the large-input scaled configs).
    """

    variant: str = "b0"
    dtype: Any = jnp.bfloat16
    asc_depth_order: bool = False
    remat: bool = False
    fused_tail: bool = True
    # stochastic-depth rate (keras EfficientNet drop_connect_rate default);
    # 0.0 makes train-mode forwards deterministic (cross-framework parity)
    drop_connect_rate: float = 0.2
    # inference-only mode expecting models/bn_fold.py fold_variables output
    bn_fold: bool = False
    # inference-only int8 serving ("int8") / calibration ("calib") mode
    # expecting models/quantize.py quantize_variables output
    quant: Any = False
    # compressed-residual encoder training ("int8"/"bf16", ops/qres.py)
    qres: Any = None
    # width of the decoder's last two stages; 32 = reference (see
    # core/config.py decoder_head_ch)
    head_ch: int = 32
    # frozen-encoder byte-floor probe (core/config.py qenc): run the
    # ENCODER serving-style inside the TRAIN step — "bf16" = BN-folded
    # inference graph, "int8" = the quantized serving graph — under
    # stop_gradient, training only the decoder. Deviates from the
    # reference's BN-only-trainable freezing (encoder BN affine+stats are
    # frozen too); measurement-first, gated by the same metric budgets as
    # serving.
    qenc: str = ""

    @nn.compact
    def __call__(self, x, train: bool = False, pixels=None):
        enc_cls = (
            nn.remat(EfficientNetEncoder, static_argnums=(2,))
            if self.remat
            else EfficientNetEncoder
        )
        enc_train = train and not self.qenc
        top, taps = enc_cls(
            variant=self.variant,
            dtype=self.dtype,
            drop_connect_rate=self.drop_connect_rate,
            bn_fold=self.bn_fold or self.qenc == "bf16",
            quant=self.quant or ("int8" if self.qenc == "int8" else False),
            qres=self.qres,
            name="encoder",
        )(x, enc_train)
        if self.qenc:
            top = jax.lax.stop_gradient(top)
            taps = jax.tree_util.tree_map(jax.lax.stop_gradient, taps)
        return SkipConcatDecoder(
            dtype=self.dtype, fused_tail=self.fused_tail,
            bn_fold=self.bn_fold, quant=self.quant, head_ch=self.head_ch,
            name="decoder",
        )(top, taps, train, pixels)


class ReDWebFullyFledged(nn.Module):
    """ResNet-50 encoder + ReDWeb feature-fusion decoder."""

    dtype: Any = jnp.bfloat16
    asc_depth_order: bool = False
    remat: bool = False
    bn_fold: bool = False
    # inference-only int8 serving / calibration (models/quantize.py)
    quant: Any = False

    @nn.compact
    def __call__(self, x, train: bool = False, pixels=None):
        enc_cls = (
            nn.remat(ResNet50Encoder, static_argnums=(2,))
            if self.remat
            else ResNet50Encoder
        )
        c5, taps = enc_cls(
            dtype=self.dtype, bn_fold=self.bn_fold, quant=self.quant,
            name="encoder",
        )(x, train)
        return ReDWebDecoder(
            dtype=self.dtype, bn_fold=self.bn_fold, quant=self.quant,
            name="decoder",
        )(c5, taps, train, pixels)


@dataclasses.dataclass(frozen=True)
class PLDepthModel:
    name: str
    module: nn.Module
    preprocess: str  # normalization family for data/preprocess.py
    asc_depth_order: bool = False

    def init_variables(self, rng: jax.Array, input_shape, train: bool = False):
        dummy = jnp.zeros((1, *input_shape), jnp.float32)
        rngs = {"params": rng, "droppath": jax.random.fold_in(rng, 1)}
        # jitted init: eager flax init dispatches hundreds of tiny ops, which
        # is pathological over a remote-TPU tunnel (~300s observed for B0)
        init_fn = jax.jit(self.module.init, static_argnums=(2,))
        return init_fn(rngs, dummy, train)


MODEL_REGISTRY: Dict[str, Callable[..., PLDepthModel]] = {
    "ff_effnet": lambda dtype=jnp.bfloat16, remat=False, fused_tail=True,
    bn_fold=False, head_ch=32, qres=None: PLDepthModel(
        "ff_effnet",
        EffNetFullyFledged(
            variant="b0", dtype=dtype, remat=remat, fused_tail=fused_tail,
            bn_fold=bn_fold, head_ch=head_ch, qres=qres,
        ),
        "effnet",
    ),
    # CI/bring-up model (models/efficientnet.py VARIANTS["smoke"]): full
    # topology, ~2% of B0's step FLOPs, compiles in seconds. Not a
    # reference model — for smoke tests and trainer-mechanics CI.
    "ff_smoke": lambda dtype=jnp.bfloat16, remat=False, fused_tail=True,
    bn_fold=False, head_ch=32, qres=None: PLDepthModel(
        "ff_smoke",
        EffNetFullyFledged(
            variant="smoke", dtype=dtype, remat=remat, fused_tail=fused_tail,
            bn_fold=bn_fold, head_ch=head_ch, qres=qres,
        ),
        "effnet",
    ),
    # fused_tail / head_ch are EfficientNet-decoder-only; accepted and
    # ignored here so the registry call signature stays uniform
    "ff_redweb": lambda dtype=jnp.bfloat16, remat=False, fused_tail=True,
    bn_fold=False, head_ch=32, qres=None: PLDepthModel(
        "ff_redweb",
        ReDWebFullyFledged(dtype=dtype, remat=remat, bn_fold=bn_fold),
        "caffe",
    ),
}
for _v in VARIANTS:
    # b0 is registered as plain "ff_effnet"; "smoke" as "ff_smoke" above
    if _v not in ("b0", "smoke"):
        MODEL_REGISTRY[f"ff_effnet_{_v}"] = (
            lambda dtype=jnp.bfloat16, remat=False, fused_tail=True,
            bn_fold=False, head_ch=32, qres=None, _v=_v: PLDepthModel(
                f"ff_effnet_{_v}",
                EffNetFullyFledged(
                    variant=_v, dtype=dtype, remat=remat, fused_tail=fused_tail,
                    bn_fold=bn_fold, head_ch=head_ch, qres=qres,
                ),
                "effnet",
            )
        )


def get_model_type_by_name(model_name: str) -> str:
    """Reference-name validation (models_meta.py:18-24), extended variants."""
    if model_name not in MODEL_REGISTRY:
        raise ValueError(
            f"Unknown model name: {model_name} (have {sorted(MODEL_REGISTRY)})"
        )
    return model_name


def get_pl_depth_net(
    model_name: str, compute_dtype: str = "bfloat16", remat: bool = False,
    fused_tail: bool = True, bn_fold: bool = False, head_ch: int = 32,
    qres=None,
) -> PLDepthModel:
    get_model_type_by_name(model_name)
    dtype = jnp.dtype(compute_dtype)
    if qres and "redweb" in model_name:
        raise ValueError("--qres is implemented for the ff_effnet family")
    return MODEL_REGISTRY[model_name](
        dtype=dtype, remat=remat, fused_tail=fused_tail, bn_fold=bn_fold,
        head_ch=head_ch, qres=qres,
    )


def partition_params(params, freeze_encoder: bool = True):
    """Label each param leaf "trainable" / "frozen".

    Frozen = encoder params that are not batch-norm affine, matching the
    reference's BN-only-trainable encoders (pl_hourglass.py:53-57,
    redweb.py:412-416). Flax batch-norm module names here are "...bn",
    "..._bn..." or ResNet's numbered "bn1"/"bn2"/"bn3"
    (models/resnet.py Bottleneck), with leaf names scale/bias.
    """
    import re

    bn_name = re.compile(r"(^|_)bn\d*$|_bn(_|\d|$)")

    def label(path: Tuple, _leaf) -> str:
        keys = [getattr(p, "key", str(p)) for p in path]
        in_encoder = any(k == "encoder" for k in keys)
        is_bn = any(
            isinstance(k, str) and ("bn" == k or bn_name.search(k))
            for k in keys
        )
        if freeze_encoder and in_encoder and not is_bn:
            return "frozen"
        return "trainable"

    return jax.tree_util.tree_map_with_path(label, params)
