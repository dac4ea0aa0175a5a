"""Device-resident data path (data/resident.py + Trainer.resident_step).

The resident path eliminates the per-step host→device transfer entirely:
the packed (u8 image, u16 gt, u8 mask) dataset lives in HBM sharded over the
mesh data axis, and the jitted step draws per-device batch indices, decodes,
and runs the standard step body. These tests cover the store packing
contract, sharding, step correctness/determinism, and equivalence of the
decode to the streaming path on the same drawn samples.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig, MeshConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.data import SyntheticDepthDataset, build_resident_store
from pldepth_tpu.data.resident import estimate_store_bytes
from pldepth_tpu.train import Trainer

S = 64


def _cfg(n_data=1, batch_size=4):
    # ff_smoke: the resident draw/decode/step mechanics under test are
    # model-independent; the flagship-model resident path is exercised by
    # __graft_entry__.dryrun_multichip and bench.py on the real chip
    return ExperimentConfig(
        model_name="ff_smoke", input_size=S, batch_size=batch_size,
        ranking_size=3, rankings_per_image=8, sampling_type=1,
        freeze_encoder=False, compute_dtype="float32", listmle_impl="xla",
        initial_lr=3e-4, augmentation=True,
        mesh=MeshConfig(data=n_data, model=1),
    )


def _trainer(n_data=1, batch_size=4):
    devs = jax.devices()[:n_data]
    cfg = _cfg(n_data, batch_size)
    return Trainer(cfg, steps_per_epoch=1, mesh=make_mesh(cfg.mesh, devs))


@pytest.fixture(scope="module")
def shared():
    """One 1-device trainer + 8-sample store + initial state, shared by
    every mechanics test below (each compile here costs tens of seconds)."""
    ds = SyntheticDepthDataset(n=8, image_size=S, seed=0)
    tr = _trainer(n_data=1)
    store = build_resident_store(ds, tr.mesh)
    return ds, tr, store


def test_store_packing_contract(shared):
    _, tr, _ = shared
    ds = SyntheticDepthDataset(n=10, image_size=S, seed=0)
    store = build_resident_store(ds, tr.mesh)
    assert store.n == 10
    assert store.arrays["image"].shape == (10, S, S, 3)
    assert store.arrays["image"].dtype == jnp.uint8
    assert store.arrays["gt"].dtype == jnp.uint16
    assert store.arrays["mask"].dtype == jnp.uint8
    assert store.nbytes == estimate_store_bytes(10, S) + 4  # + gt_scale f32

    # decode round-trip: u8 image within 1/255, u16 gt within quantization
    s0 = ds[0]
    img = np.asarray(store.arrays["image"][0], np.float32) / 255.0
    np.testing.assert_allclose(img, s0["image"], atol=0.5 / 255)
    gt = np.asarray(store.arrays["gt"][0], np.float32) * store.gt_scale
    np.testing.assert_allclose(gt, s0["gt"], atol=store.gt_scale)
    np.testing.assert_array_equal(
        np.asarray(store.arrays["mask"][0]), (s0["mask"] > 0).astype(np.uint8)
    )


def test_store_truncates_for_even_sharding():
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = SyntheticDepthDataset(n=11, image_size=S, seed=0)
    tr = _trainer(n_data=8, batch_size=8)
    store = build_resident_store(ds, tr.mesh)
    assert store.n == 8
    shards = {s.data.shape for s in store.arrays["image"].addressable_shards}
    assert shards == {(1, S, S, 3)}, shards


def test_resident_step_runs_and_is_deterministic(shared):
    _, tr, store = shared

    s1 = tr.init_state()
    s1, m1 = tr.resident_step(s1, store.arrays)
    assert bool(m1.finite)
    assert int(jax.device_get(s1.step)) == 1

    # same rng_root + step -> identical loss (resume determinism: the draw
    # stream is a pure function of state, like the streaming path's RNG)
    s2 = _trainer(n_data=1).init_state()
    s2, m2 = tr.resident_step(s2, store.arrays)
    np.testing.assert_array_equal(
        np.asarray(jax.device_get(m1.loss)), np.asarray(jax.device_get(m2.loss))
    )


@pytest.mark.slow
def test_resident_dp8_matches_replicated_math():
    """dp8 resident step is finite and the per-device draws differ (each
    shard draws its own indices) while state stays replicated."""
    devs = jax.devices()
    if len(devs) < 8:
        pytest.skip("needs 8 virtual devices")
    ds = SyntheticDepthDataset(n=16, image_size=S, seed=0)
    tr = _trainer(n_data=8, batch_size=8)
    store = build_resident_store(ds, tr.mesh)
    state = tr.init_state()
    state, m = tr.resident_step(state, store.arrays)
    assert bool(jax.device_get(m.finite))
    assert np.isfinite(float(jax.device_get(m.loss)))


@pytest.mark.slow
def test_resident_training_reduces_loss(shared):
    """A short resident-mode fit must actually train (loss decreases),
    proving the drawn batches are real data, not garbage gathers."""
    _, tr, store = shared
    state = tr.init_state()
    losses = []
    for _ in range(30):
        state, m = tr.resident_step(state, store.arrays)
        losses.append(float(jax.device_get(m.loss)))
    assert np.mean(losses[-5:]) < np.mean(losses[:5]), losses


def test_resident_chain_matches_single_steps(shared):
    """resident_chain(n) == n resident_step calls: same final step count and
    the same per-step losses (the scan advances state.step exactly like the
    single-step path, so the draw/augment/sample RNG streams coincide)."""
    _, tr, store = shared

    s1 = tr.init_state()
    single_losses = []
    for _ in range(3):
        s1, m = tr.resident_step(s1, store.arrays)
        single_losses.append(float(jax.device_get(m.loss)))

    s2 = tr.init_state()
    s2, mc = tr.resident_chain(3)(s2, store.arrays)
    chain_losses = [float(x) for x in jax.device_get(mc.loss)]
    assert int(jax.device_get(s2.step)) == 3
    assert mc.loss.shape == (3,)
    # scan-compiled vs standalone-compiled step bodies reassociate fp32
    # reductions differently (observed 2.9e-5 on step 3); semantics equal
    np.testing.assert_allclose(chain_losses, single_losses, rtol=1e-4)
    assert all(bool(x) for x in jax.device_get(mc.finite))


def test_fit_resident_chain_mode(shared):
    """fit() with resident_chain_steps > 1 trains whole chunks per dispatch,
    including a remainder chunk, and records per-step losses.

    Reuses the shared trainer with chain 3 + remainder 1: both programs are
    already compiled by the preceding tests (chain(3) above, resident_step
    in the fixture) — a second Trainer at chain=2 cost this file ~80 s of
    duplicate compiles for the same mechanics."""
    _, tr, store = shared
    prev_steps, prev_cfg = tr.steps_per_epoch, tr.cfg
    tr.steps_per_epoch = 4
    tr.cfg = prev_cfg.replace(resident_chain_steps=3)
    try:
        state = tr.init_state()
        state, history = tr.fit(state, None, epochs=1, resident_store=store)
        assert int(jax.device_get(state.step)) == 4  # chunk of 3 + remainder 1
        assert len(history["loss"]) == 1 and np.isfinite(history["loss"][0])
    finally:
        tr.steps_per_epoch, tr.cfg = prev_steps, prev_cfg


def test_fit_resident_mode(shared):
    _, tr, store = shared
    prev = tr.steps_per_epoch
    tr.steps_per_epoch = 2
    try:
        state = tr.init_state()
        state, history = tr.fit(state, None, epochs=2, resident_store=store)
        assert len(history["loss"]) == 2
        assert all(np.isfinite(history["loss"]))
        assert int(jax.device_get(state.step)) == 4
    finally:
        tr.steps_per_epoch = prev  # module-scoped fixture: undo the mutation
