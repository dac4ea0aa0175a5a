"""Model family tests: output shapes, tap resolutions, partitioning."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

pytestmark = pytest.mark.slow

from pldepth_tpu.models import get_pl_depth_net, partition_params, MODEL_REGISTRY
from pldepth_tpu.models.efficientnet import EfficientNetEncoder, round_filters
from pldepth_tpu.models.resnet import ResNet50Encoder

S = 64  # small input divisible by 32 (CPU tests)


def _apply(model, x, train=False):
    variables = model.init_variables(jax.random.key(0), x.shape[1:])
    rngs = {"droppath": jax.random.key(1)} if train else {}
    return model.module.apply(
        variables, x, train,
        rngs=rngs, mutable=["batch_stats"] if train else False,
    )


def test_effnet_encoder_tap_resolutions():
    enc = EfficientNetEncoder(variant="b0", dtype=jnp.float32)
    x = jnp.zeros((1, S, S, 3))
    vars_ = enc.init({"params": jax.random.key(0)}, x, False)
    (top, taps) = enc.apply(vars_, x, False)
    assert top.shape == (1, S // 32, S // 32, round_filters(1280, 1.0))
    # reference skip taps: block6a/4a/3a expand activations at 1/16, 1/8, 1/4
    assert taps["expand_6"].shape == (1, S // 16, S // 16, 672)
    assert taps["expand_4"].shape == (1, S // 8, S // 8, 240)
    assert taps["expand_3"].shape == (1, S // 4, S // 4, 144)


def test_resnet_encoder_tap_resolutions():
    enc = ResNet50Encoder(dtype=jnp.float32)
    x = jnp.zeros((1, S, S, 3))
    vars_ = enc.init({"params": jax.random.key(0)}, x, False)
    c5, taps = enc.apply(vars_, x, False)
    assert c5.shape == (1, S // 32, S // 32, 2048)
    assert taps["c2"].shape == (1, S // 4, S // 4, 256)
    assert taps["c3"].shape == (1, S // 8, S // 8, 512)
    assert taps["c4_mid"].shape == (1, S // 16, S // 16, 1024)


@pytest.mark.parametrize("name", ["ff_effnet", "ff_redweb"])
def test_full_model_output_full_resolution(name):
    model = get_pl_depth_net(name, compute_dtype="float32")
    x = jnp.zeros((2, S, S, 3))
    out = _apply(model, x)
    assert out.shape == (2, S, S, 1)
    assert out.dtype == jnp.float32


def test_train_mode_updates_batch_stats(rng):
    model = get_pl_depth_net("ff_effnet", compute_dtype="float32")
    x = jnp.array(rng.normal(size=(2, S, S, 3)).astype(np.float32))
    variables = model.init_variables(jax.random.key(0), x.shape[1:])
    out, updates = model.module.apply(
        variables, x, True, rngs={"droppath": jax.random.key(1)},
        mutable=["batch_stats"],
    )
    before = jax.tree_util.tree_leaves(variables["batch_stats"])
    after = jax.tree_util.tree_leaves(updates["batch_stats"])
    changed = any(
        not np.allclose(np.asarray(b), np.asarray(a)) for b, a in zip(before, after)
    )
    assert changed, "train mode must update BN running stats"


def test_partition_freezes_encoder_except_bn():
    model = get_pl_depth_net("ff_effnet", compute_dtype="float32")
    variables = model.init_variables(jax.random.key(0), (S, S, 3))
    labels = partition_params(variables["params"], freeze_encoder=True)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    froze, trained = 0, 0
    for path, lab in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        if lab == "frozen":
            froze += 1
            assert "encoder" in keys
            assert not any("bn" in str(k) for k in keys), keys
        else:
            trained += 1
    assert froze > 0 and trained > 0
    # decoder fully trainable
    for path, lab in flat:
        keys = [getattr(p, "key", str(p)) for p in path]
        if "decoder" in keys:
            assert lab == "trainable"


def test_partition_no_freeze_all_trainable():
    model = get_pl_depth_net("ff_effnet", compute_dtype="float32")
    variables = model.init_variables(jax.random.key(0), (S, S, 3))
    labels = partition_params(variables["params"], freeze_encoder=False)
    assert all(l == "trainable" for l in jax.tree_util.tree_leaves(labels))


def test_registry_contains_scaled_variants():
    assert "ff_effnet_b4" in MODEL_REGISTRY
    assert "ff_effnet_b7" in MODEL_REGISTRY


@pytest.mark.slow
def test_partition_redweb_bn_trainable():
    """ff_redweb: the numbered bn1/bn2/bn3 BatchNorms inside ResNet
    bottlenecks must stay trainable under freeze_encoder (the reference
    keeps ALL encoder BN trainable, redweb.py:412-416); everything else
    in the encoder freezes."""
    model = get_pl_depth_net("ff_redweb", compute_dtype="float32")
    variables = model.init_variables(jax.random.key(0), (S, S, 3))
    labels = partition_params(variables["params"], freeze_encoder=True)
    flat = jax.tree_util.tree_flatten_with_path(labels)[0]
    bn_seen = 0
    for path, lab in flat:
        keys = [str(getattr(p, "key", p)) for p in path]
        if "encoder" not in keys:
            assert lab == "trainable"
            continue
        is_bn = any(k == "bn" or k.startswith("bn") or k.endswith("bn") or "_bn" in k
                    for k in keys)
        if is_bn:
            bn_seen += 1
            assert lab == "trainable", keys
        else:
            assert lab == "frozen", keys
    assert bn_seen > 20  # stem + 3 per bottleneck
