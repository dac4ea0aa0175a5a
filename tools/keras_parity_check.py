"""Numerical parity check: Flax encoders vs Keras applications.

Builds keras.applications EfficientNetB0 / ResNet50 with random weights,
converts them through models/convert.py, and compares every decoder tap and
the final activation between Keras and the pldepth_tpu Flax encoders on the
same inputs. This validates both the converter name-mapping and the
architectural fidelity of the from-scratch encoders (padding conventions,
SE wiring, BN epsilons, mid-stage taps).

Run: python tools/keras_parity_check.py  (CPU, ~3-6 min on one core)
"""

from __future__ import annotations

import os
import sys

os.environ.setdefault("CUDA_VISIBLE_DEVICES", "")
os.environ.setdefault("JAX_PLATFORMS", "cpu")
sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import numpy as np

# XLA:CPU's default conv/dot precision is bf16-fastmath on AMX hosts, which
# injects ~1e-3 relative error; parity comparison needs exact fp32.
jax.config.update("jax_default_matmul_precision", "highest")

# max |a-b| relative to max |b|; measured 2.1e-5 (EffNet-B0, 82 layers of
# fp32 accumulation noise) and 1.7e-6 (ResNet50) on this host
ATOL_REL = 5e-5


def _rel(a, b):
    a, b = np.asarray(a), np.asarray(b)
    return float(np.abs(a - b).max() / (np.abs(b).max() + 1e-12))


def check_efficientnet(size: int = 64) -> dict:
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from pldepth_tpu.models import pretrained
    from pldepth_tpu.models.convert import convert_keras_efficientnet
    from pldepth_tpu.models.efficientnet import EfficientNetEncoder

    km = tf.keras.applications.EfficientNetB0(
        include_top=False, weights=None, input_shape=(size, size, 3)
    )
    sub = tf.keras.Model(
        km.input,
        [
            km.get_layer("normalization").output,
            km.get_layer("block3a_expand_activation").output,
            km.get_layer("block4a_expand_activation").output,
            km.get_layer("block6a_expand_activation").output,
            km.output,
        ],
    )
    x_raw = np.random.default_rng(0).uniform(0, 255, (2, size, size, 3)).astype(
        np.float32
    )
    norm_in, k3, k4, k6, k_out = [np.asarray(t) for t in sub(x_raw, training=False)]

    enc = EfficientNetEncoder(variant="b0", dtype=jnp.float32)
    vars_ = jax.jit(enc.init, static_argnums=(2,))(
        {"params": jax.random.key(0)}, jnp.zeros((1, size, size, 3)), False
    )
    np.savez("/tmp/_effnet_conv.npz", **convert_keras_efficientnet(km))
    params, stats = pretrained.load_backbone(
        "/tmp/_effnet_conv.npz",
        {"encoder": vars_["params"]},
        {"encoder": vars_["batch_stats"]},
    )
    top, taps = enc.apply(
        {"params": params["encoder"], "batch_stats": stats["encoder"]},
        jnp.array(norm_in),
        False,
    )
    return {
        "expand_3": _rel(taps["expand_3"], k3),
        "expand_4": _rel(taps["expand_4"], k4),
        "expand_6": _rel(taps["expand_6"], k6),
        "top": _rel(top, k_out),
    }


def check_resnet50(size: int = 64) -> dict:
    import jax
    import jax.numpy as jnp
    import tensorflow as tf

    from pldepth_tpu.models import pretrained
    from pldepth_tpu.models.convert import convert_keras_resnet50
    from pldepth_tpu.models.resnet import ResNet50Encoder

    km = tf.keras.applications.ResNet50(
        include_top=False, weights=None, input_shape=(size, size, 3)
    )
    sub = tf.keras.Model(
        km.input,
        [
            km.get_layer("conv2_block3_out").output,
            km.get_layer("conv3_block4_out").output,
            km.get_layer("conv4_block3_out").output,
            km.get_layer("conv5_block3_out").output,
        ],
    )
    x = np.random.default_rng(0).normal(size=(2, size, size, 3)).astype(np.float32)
    k2, k3, k4, k5 = [np.asarray(t) for t in sub(x, training=False)]

    enc = ResNet50Encoder(dtype=jnp.float32)
    vars_ = jax.jit(enc.init, static_argnums=(2,))(
        {"params": jax.random.key(0)}, jnp.zeros((1, size, size, 3)), False
    )
    np.savez("/tmp/_resnet_conv.npz", **convert_keras_resnet50(km))
    params, stats = pretrained.load_backbone(
        "/tmp/_resnet_conv.npz",
        {"encoder": vars_["params"]},
        {"encoder": vars_["batch_stats"]},
    )
    c5, taps = enc.apply(
        {"params": params["encoder"], "batch_stats": stats["encoder"]},
        jnp.array(x),
        False,
    )
    return {
        "c2": _rel(taps["c2"], k2),
        "c3": _rel(taps["c3"], k3),
        "c4_mid": _rel(taps["c4_mid"], k4),
        "c5": _rel(c5, k5),
    }


def main():
    ok = True
    for name, fn in [("efficientnet_b0", check_efficientnet), ("resnet50", check_resnet50)]:
        rel = fn()
        worst = max(rel.values())
        status = "OK" if worst < ATOL_REL else "FAIL"
        ok &= worst < ATOL_REL
        print(f"{name}: {status} (worst rel diff {worst:.2e}) {rel}")
    sys.exit(0 if ok else 1)


if __name__ == "__main__":
    main()
