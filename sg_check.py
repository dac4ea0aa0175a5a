"""Parity check for the frozen-encoder stop_gradient optimization.

Runs one train step twice in-process — once with the stop_gradient path,
once with the old compute-then-zero backward — from identical state and
asserts: loss matches to f32 fusion-rounding tolerance, trainable updates
match, and frozen encoder leaves are exactly unchanged from init in BOTH
paths. CPU-only, tiny shapes, float32 compute (bf16 would hide semantic
differences behind its own rounding).
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_default_matmul_precision", "highest")

import pldepth_tpu.train.trainer as T
from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.models import partition_params


def run(no_sg: bool):
    T._NO_SG_FROZEN = no_sg
    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=64, batch_size=2,
        ranking_size=3, rankings_per_image=4, seed=7,
        compute_dtype="float32",
        # Large eps makes the first amsgrad step ~linear in the gradient
        # (update ≈ lr·g). With the keras-default 1e-7 eps, leaves whose TRUE
        # grad is zero (decoder conv biases feed straight into train-mode BN)
        # get 1e-12 numeric-noise grads normalized up to O(lr) updates with
        # arbitrary signs — which legitimately differ between the two HLO
        # graphs and would fail the comparison while meaning nothing.
        adam_eps=1.0,
    )
    tr = T.Trainer(cfg, steps_per_epoch=2, mesh=make_mesh(devices=jax.devices()[:1]))
    state = tr.init_state()
    rng = np.random.RandomState(0)
    batch = {
        "image": rng.rand(2, 64, 64, 3).astype(np.float32),
        "gt": rng.rand(2, 64, 64).astype(np.float32),
        "mask": np.ones((2, 64, 64), np.float32),
    }
    # Capture init params BEFORE the step: train_step donates its state arg
    # (donate_argnums), so state.params buffers are deleted by the call.
    init = jax.device_get(state.params)
    labels = partition_params(init, True)
    new_state, metrics = tr.train_step(state, tr.shard_batch(batch))
    return (
        init,
        jax.device_get(new_state.params),
        labels,
        float(jax.device_get(metrics.loss)),
        bool(jax.device_get(metrics.finite)),
    )


init_sg, p_sg, labels, loss_sg, fin_sg = run(no_sg=False)
init_old, p_old, _, loss_old, fin_old = run(no_sg=True)

assert fin_sg and fin_old
np.testing.assert_allclose(loss_sg, loss_old, rtol=1e-5)

flat = lambda t: sorted(jax.tree_util.tree_leaves_with_path(t), key=lambda kv: str(kv[0]))
n_frozen = n_trainable = 0
for (k, a), (_, b), (_, init_a), (_, lab) in zip(
    flat(p_sg), flat(p_old), flat(init_sg), flat(labels)
):
    if lab == "frozen":
        # zero update in both paths -> bit-identical to init
        np.testing.assert_array_equal(a, init_a, err_msg=f"sg moved {k}")
        np.testing.assert_array_equal(b, init_a, err_msg=f"old moved {k}")
        n_frozen += 1
    else:
        np.testing.assert_allclose(
            np.asarray(a, np.float64), np.asarray(b, np.float64),
            rtol=1e-4, atol=1e-6, err_msg=str(k),
        )
        n_trainable += 1
assert n_frozen > 50, n_frozen
print(f"PARITY OK: loss {loss_sg:.6f} vs {loss_old:.6f}; "
      f"{n_frozen} frozen leaves pinned, {n_trainable} trainable leaves match")
