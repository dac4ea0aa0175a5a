"""Inference BN-fold (models/bn_fold.py): exactness + mode guards.

The fold collapses every conv->BatchNorm pair into one biased conv for
serving (VERDICT round-1 item 7). These tests prove the folded forward
equals the standard inference forward in f32 (tight) for both model
families, and that the fold is refused in train mode / without stats.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pldepth_tpu.models.bn_fold import fold_variables
from pldepth_tpu.models.pldepth_net import get_pl_depth_net


def _nontrivial(variables):
    # init stats are mean=0/var=1 which would hide scale/offset bugs; give
    # every 1-d leaf (BN affine + stats + conv biases) a distinct profile
    return jax.tree.map(
        lambda v: v + (0.05 * jnp.arange(v.size, dtype=v.dtype).reshape(v.shape))
        % 0.3
        if v.ndim == 1
        else v,
        variables,
    )


@pytest.mark.slow  # full-model compile (B0 + ReDWeb)
@pytest.mark.parametrize("name", ["ff_effnet", "ff_redweb"])
def test_folded_forward_matches_f32(name, rng):
    model = get_pl_depth_net(name, compute_dtype="float32")
    variables = _nontrivial(
        model.init_variables(jax.random.PRNGKey(0), (64, 64, 3))
    )
    x = jnp.asarray(rng.uniform(size=(2, 64, 64, 3)), jnp.float32)
    ref = np.asarray(model.module.apply(variables, x, False))

    folded_model = get_pl_depth_net(name, compute_dtype="float32", bn_fold=True)
    folded = fold_variables(variables, name)
    assert "batch_stats" not in folded
    got = np.asarray(folded_model.module.apply(folded, x, False))
    rel = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-12)
    assert rel < 2e-5, rel


@pytest.mark.slow  # full-model compile (B0 serving graphs)
def test_trainer_predict_bnfold_matches():
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=64, batch_size=2,
        compute_dtype="float32",
    )
    tr = Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1]))
    state = tr.init_state()
    # perturb stats so the fold actually has work to do
    state = state.replace(batch_stats=_nontrivial(state.batch_stats))
    imgs = np.random.default_rng(0).uniform(size=(2, 64, 64, 3)).astype(np.float32)
    ref = np.asarray(tr.jit_predict()(state, imgs))
    got = np.asarray(tr.jit_predict(fused="bn_fold")(state, imgs))
    rel = np.max(np.abs(got - ref)) / (np.max(np.abs(ref)) + 1e-12)
    assert rel < 2e-5, rel


def test_fold_requires_stats_and_inference():
    model = get_pl_depth_net("ff_effnet", compute_dtype="float32", bn_fold=True)
    with pytest.raises(ValueError, match="batch_stats"):
        fold_variables({"params": {}}, "ff_effnet")
    variables = {"params": {}}
    x = jnp.zeros((1, 32, 32, 3))
    with pytest.raises(ValueError, match="inference-only"):
        model.module.apply(variables, x, True)
