"""Keras → Flax backbone weight conversion.

The reference took ImageNet encoders straight from ``keras.applications``
(pl_hourglass.py:48, redweb.py:410). To use those checkpoints here, this
module maps a Keras EfficientNet/ResNet50 model's weights onto the
pldepth_tpu parameter tree and writes the ``.npz`` consumed by
``models/pretrained.py`` (run offline wherever TF + the weights exist; this
image has TF but no network, so conversion is exercised with random weights
by the numerical parity tool, tools/keras_parity_check.py, and exposed as
``cli convert``).

Name maps:
  EfficientNet  block{S}{letter}_expand_conv -> encoder/stage{S}_block{i}/expand_conv ...
  ResNet50      conv{S}_block{B}_{1,2,3}_conv -> encoder/stage{S}_block{B-1}/conv{1,2,3},
                _0_conv/_0_bn -> proj_conv/proj_bn
"""

from __future__ import annotations

import string
from typing import Dict

import numpy as np


def _bn_entries(prefix: str, weights) -> Dict[str, np.ndarray]:
    gamma, beta, mean, var = [np.asarray(w) for w in weights]
    return {
        f"params/{prefix}/scale": gamma,
        f"params/{prefix}/bias": beta,
        f"batch_stats/{prefix}/mean": mean,
        f"batch_stats/{prefix}/var": var,
    }


def _conv_entries(prefix: str, weights) -> Dict[str, np.ndarray]:
    out = {f"params/{prefix}/kernel": np.asarray(weights[0])}
    if len(weights) > 1:
        out[f"params/{prefix}/bias"] = np.asarray(weights[1])
    return out


def convert_keras_efficientnet(keras_model) -> Dict[str, np.ndarray]:
    """Keras EfficientNetBX(include_top=False) -> flat npz dict."""
    out: Dict[str, np.ndarray] = {}
    by_name = {l.name: l for l in keras_model.layers}

    out.update(_conv_entries("encoder/stem_conv", by_name["stem_conv"].weights))
    out.update(_bn_entries("encoder/stem_bn", by_name["stem_bn"].weights))
    out.update(_conv_entries("encoder/top_conv", by_name["top_conv"].weights))
    out.update(_bn_entries("encoder/top_bn", by_name["top_bn"].weights))

    letters = string.ascii_lowercase
    for name, layer in by_name.items():
        if not name.startswith("block"):
            continue
        stage = int(name[5])
        idx = letters.index(name[6])
        me = f"encoder/stage{stage}_block{idx}"
        part = name[8:]  # after "block{S}{l}_"
        if part == "expand_conv":
            out.update(_conv_entries(f"{me}/expand_conv", layer.weights))
        elif part == "expand_bn":
            out.update(_bn_entries(f"{me}/expand_bn", layer.weights))
        elif part == "dwconv":
            k = np.asarray(layer.weights[0])  # (k, k, C, 1)
            out[f"params/{me}/dw_conv/kernel"] = np.transpose(k, (0, 1, 3, 2))
        elif part == "bn":
            out.update(_bn_entries(f"{me}/dw_bn", layer.weights))
        elif part == "se_reduce":
            out.update(_conv_entries(f"{me}/se/reduce", layer.weights))
        elif part == "se_expand":
            out.update(_conv_entries(f"{me}/se/expand", layer.weights))
        elif part == "project_conv":
            out.update(_conv_entries(f"{me}/project_conv", layer.weights))
        elif part == "project_bn":
            out.update(_bn_entries(f"{me}/project_bn", layer.weights))
    return out


def convert_keras_resnet50(keras_model) -> Dict[str, np.ndarray]:
    """Keras ResNet50(include_top=False) -> flat npz dict."""
    out: Dict[str, np.ndarray] = {}
    by_name = {l.name: l for l in keras_model.layers}
    out.update(_conv_entries("encoder/stem_conv", by_name["conv1_conv"].weights))
    out.update(_bn_entries("encoder/stem_bn", by_name["conv1_bn"].weights))

    for name, layer in by_name.items():
        if not name.startswith("conv") or "_block" not in name:
            continue
        stage = int(name[4])  # 2..5
        rest = name.split("_")  # conv2, block1, 1, conv/bn
        if len(rest) != 4 or rest[3] not in ("conv", "bn"):
            continue  # skip _add / _out / _relu layers
        block = int(rest[1][5:]) - 1
        slot, kind = rest[2], rest[3]
        me = f"encoder/stage{stage}_block{block}"
        target = {"0": "proj", "1": "1", "2": "2", "3": "3"}[slot]
        if kind == "conv":
            pref = f"{me}/proj_conv" if target == "proj" else f"{me}/conv{target}"
            out.update(_conv_entries(pref, layer.weights))
        elif kind == "bn":
            pref = f"{me}/proj_bn" if target == "proj" else f"{me}/bn{target}"
            out.update(_bn_entries(pref, layer.weights))
    return out


def convert_keras_file(h5_or_dir: str, model_name: str, out_npz: str) -> str:
    """Offline entry: load a Keras model file and write the converted npz."""
    import tensorflow as tf

    keras_model = tf.keras.models.load_model(h5_or_dir, compile=False)
    if "effnet" in model_name:
        tensors = convert_keras_efficientnet(keras_model)
    elif "redweb" in model_name or "resnet" in model_name:
        tensors = convert_keras_resnet50(keras_model)
    else:
        raise ValueError(f"unknown model family for {model_name}")
    np.savez(out_npz, **tensors)
    return out_npz
