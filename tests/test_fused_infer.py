"""Fused serving encoder (models/fused_infer.py) vs the Flax inference path."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

pytestmark = pytest.mark.slow  # full-model compiles (B0/B1 fused-serving graphs)

from pldepth_tpu.models.efficientnet import EfficientNetEncoder
from pldepth_tpu.models import fused_infer


def _init_encoder(size=64, batch=2, seed=0, variant="b0"):
    enc = EfficientNetEncoder(variant=variant)
    x = jax.random.normal(jax.random.PRNGKey(seed), (batch, size, size, 3))
    x = (x * 0.3).astype(jnp.bfloat16)
    variables = enc.init(jax.random.PRNGKey(1), x, False)
    # randomize batch stats so BN folding is actually exercised
    ks = iter(jax.random.split(jax.random.PRNGKey(2), 400))

    def rand_stats(path, leaf):
        k = next(ks)
        if path[-1].key == "var":
            return jnp.exp(jax.random.normal(k, leaf.shape) * 0.2)
        return jax.random.normal(k, leaf.shape) * 0.2

    stats = jax.tree_util.tree_map_with_path(
        rand_stats, variables["batch_stats"]
    )
    return enc, {"params": variables["params"], "batch_stats": stats}, x


@pytest.fixture(scope="module")
def setup():
    return _init_encoder()


def _run_and_compare(variables, x, enc, vmem_budget):
    plans = fused_infer.plan_encoder(
        variables["params"], variables["batch_stats"],
        (x.shape[1], x.shape[2]), "b0", vmem_budget=vmem_budget,
    )
    top_f, taps_f = fused_infer.encoder_infer(
        variables["params"], variables["batch_stats"], x, plans
    )
    top_r, taps_r = enc.apply(variables, x, False)
    for name, (a, b) in {
        "top": (top_f, top_r),
        **{k: (taps_f[k], taps_r[k]) for k in taps_r},
    }.items():
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert rel < 0.03, f"{name}: rel {rel}"
    return plans


def test_all_xla_folded_path_matches(setup):
    """vmem_budget=0 forces every block onto the folded-BN XLA path,
    isolating the parameter-folding math."""
    enc, variables, x = setup
    plans = _run_and_compare(variables, x, enc, vmem_budget=0)
    assert not any(p.fused for p in plans)


def test_fused_path_matches(setup):
    enc, variables, x = setup
    plans = _run_and_compare(variables, x, enc, vmem_budget=1 << 62)
    fused = [p.name for p in plans if p.fused]
    taps = [p.name for p in plans if p.tap]
    assert len(fused) == 13 and len(taps) == 3  # 16 B0 blocks total


def test_trainer_predict_fused_matches_predict():
    """End-to-end serving surface: Trainer.predict_fused == Trainer.predict
    (bf16 rounding) on a randomly-initialized ff_effnet."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(model_name="ff_effnet", input_size=64, batch_size=2)
    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state = trainer.init_state()
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(3), (2, 64, 64, 3)) * 255,
        np.float32,
    )
    a = np.asarray(jax.jit(trainer.predict)(state, imgs), np.float32)
    b = np.asarray(jax.jit(trainer.predict_fused)(state, imgs), np.float32)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    assert a.shape == b.shape == (2, 64, 64)
    assert rel < 0.03, rel


def test_scaled_variant_b1_matches():
    """The fused planner resolves width/depth scaling: b1 parity too
    (the --fused_encoder flag covers the whole ff_effnet family)."""
    enc, variables, x = _init_encoder(variant="b1")
    plans = fused_infer.plan_encoder(
        variables["params"], variables["batch_stats"],
        (x.shape[1], x.shape[2]), "b1", vmem_budget=1 << 62,
    )
    top_f, taps_f = fused_infer.encoder_infer(
        variables["params"], variables["batch_stats"], x, plans
    )
    top_r, taps_r = enc.apply(variables, x, False)
    for a, b in [(top_f, top_r)] + [(taps_f[k], taps_r[k]) for k in taps_r]:
        a = np.asarray(a, np.float32)
        b = np.asarray(b, np.float32)
        rel = np.abs(a - b).max() / max(np.abs(b).max(), 1e-9)
        assert rel < 0.03, rel
    assert any(p.fused for p in plans)


def test_float32_model_keeps_precision():
    """A float32 model served fused must match predict() tightly — the
    fused path computes in module.dtype, not hardcoded bf16."""
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.core.mesh import make_mesh
    from pldepth_tpu.train import Trainer

    cfg = ExperimentConfig(
        model_name="ff_effnet", input_size=64, batch_size=2,
        compute_dtype="float32",
    )
    trainer = Trainer(
        cfg, steps_per_epoch=1, mesh=make_mesh(devices=jax.devices()[:1])
    )
    state = trainer.init_state()
    imgs = np.asarray(
        jax.random.uniform(jax.random.PRNGKey(5), (2, 64, 64, 3)) * 255,
        np.float32,
    )
    a = np.asarray(jax.jit(trainer.predict)(state, imgs), np.float32)
    b = np.asarray(jax.jit(trainer.predict_fused)(state, imgs), np.float32)
    rel = np.abs(a - b).max() / max(np.abs(a).max(), 1e-9)
    assert rel < 2e-4, rel  # f32 reassociation only, no bf16 rounding


def test_plan_vmem_gate():
    """High-res early blocks must fall back to XLA under the real budget."""
    enc, variables, x = _init_encoder(size=64)
    plans = fused_infer.plan_encoder(
        variables["params"], variables["batch_stats"], (448, 448), "b0"
    )
    by_name = {p.name: p for p in plans}
    assert not by_name["stage2_block0"].fused  # 224x224x96 working set
    assert by_name["stage7_block0"].fused
    assert by_name["stage4_block0"].tap == "expand_4"
    assert not by_name["stage4_block0"].fused
