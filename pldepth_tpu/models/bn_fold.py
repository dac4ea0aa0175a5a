"""Inference-time batch-norm folding (variables transform).

For serving, every ``conv -> BatchNorm`` pair can be collapsed into a single
biased conv: with running stats (mean, var) and affine (scale, bias),

    BN(conv(x; W, b)) = conv(x; W * s, s * (b - mean) + beta),
    s = scale / sqrt(var + eps)   (per output channel).

The model modules expose a ``bn_fold`` inference mode (train=False only)
that skips the BN ops and gives every folded conv a bias;
:func:`fold_variables` turns a trained variables tree into the tree that
mode expects. Parity is exact in f32 and within compute-dtype rounding in
bf16 (tests/test_bn_fold.py).

The reference has no analogue (Keras BN runs at inference,
pldepth/models/pl_hourglass.py:53-57); this is a TPU serving optimization
evaluated per VERDICT.md round-1 item 7 — XLA already fuses the BN affine
into the conv epilogue, so the measured verdict is recorded in docs/BENCH.md.

Pairing rule: a BatchNorm named ``X`` normalizes the sibling conv named
``X.replace("bn", "conv")`` (holds by construction everywhere in
models/efficientnet.py, models/resnet.py, models/decoders.py). Epsilon is
1e-3 everywhere except the ResNet-50 encoder (1.001e-5, Keras-v1
convention) — resolved by path.
"""

from __future__ import annotations

from typing import Any, Dict

import jax.numpy as jnp

_EPS_DEFAULT = 1e-3
_EPS_RESNET = 1.001e-5


def _is_bn_stats(node: Any) -> bool:
    return isinstance(node, dict) and set(node) == {"mean", "var"}


def _fold_dict(params: Dict, stats: Dict, eps: float) -> Dict:
    """Fold every conv->bn pair under this subtree; returns new params."""
    out = dict(params)
    for key, stat_node in stats.items():
        if _is_bn_stats(stat_node):
            bn = params[key]
            conv_key = key.replace("bn", "conv")
            if conv_key == key or conv_key not in params:
                raise ValueError(
                    f"BatchNorm {key!r} has no sibling conv {conv_key!r} "
                    f"(siblings: {sorted(params)})"
                )
            conv = dict(out[conv_key])
            s = bn["scale"] / jnp.sqrt(stat_node["var"] + eps)
            kernel = conv["kernel"]
            # conv kernels are (..., in, out); depthwise too (out = channels)
            conv["kernel"] = (kernel * s).astype(kernel.dtype)
            b = conv.get("bias", jnp.zeros_like(s))
            conv["bias"] = (s * (b - stat_node["mean"]) + bn["bias"]).astype(
                s.dtype
            )
            out[conv_key] = conv
            del out[key]
        else:
            sub_eps = eps
            out[key] = _fold_dict(params[key], stat_node, sub_eps)
    return out


def fold_scope(params_scope: Dict, stats_scope: Dict, model_name: str,
               scope: str = "encoder") -> Dict:
    """Fold ONE top-level scope (e.g. just the encoder) — used by the
    frozen-encoder qenc train path, which keeps the decoder live."""
    eps = (
        _EPS_RESNET
        if model_name.startswith("ff_redweb") and scope == "encoder"
        else _EPS_DEFAULT
    )
    return _fold_dict(params_scope, stats_scope, eps)


def fold_variables(variables: Dict, model_name: str) -> Dict:
    """Return ``{"params": ...}`` for the ``bn_fold=True`` inference model.

    ``model_name`` selects the per-scope epsilon: the ff_redweb encoder is
    ResNet-50 with Keras-v1 eps 1.001e-5; every other BN uses 1e-3.
    """
    params = variables["params"]
    stats = variables.get("batch_stats")
    if not stats:
        raise ValueError("fold_variables needs batch_stats (trained BN stats)")
    params = dict(params)
    if model_name.startswith("ff_redweb"):
        folded = {}
        for key in stats:
            eps = _EPS_RESNET if key == "encoder" else _EPS_DEFAULT
            folded[key] = _fold_dict(params[key], stats[key], eps)
        new_params = {**params, **folded}
    else:
        new_params = {
            **params,
            **{k: _fold_dict(params[k], stats[k], _EPS_DEFAULT) for k in stats},
        }
    return {"params": new_params}
