"""qenc probe: serving-style frozen encoder inside the train step
(core/config.py qenc; trainer loss_fn branch; models/pldepth_net.py).

Semantics pinned here: with qenc the encoder (params, BN affine AND running
stats) is fully frozen — the forward is the bn_fold/int8 serving graph under
stop_gradient — while the decoder trains normally (params + batch stats).
"""

import jax
import numpy as np
import pytest

from pldepth_tpu.core.config import ExperimentConfig
from pldepth_tpu.core.mesh import make_mesh
from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
from pldepth_tpu.train import Trainer

S = 64


def _cfg(**kw):
    base = dict(
        model_name="ff_smoke", input_size=S, batch_size=8, ranking_size=4,
        rankings_per_image=16, initial_lr=3e-3, sampling_type=1,
        freeze_encoder=True, compute_dtype="float32", listmle_impl="xla",
    )
    base.update(kw)
    return ExperimentConfig(**base)


def _mesh1():
    return make_mesh(devices=jax.devices()[:1])


def _leaves_equal(a, b):
    fa = jax.tree_util.tree_leaves(a)
    fb = jax.tree_util.tree_leaves(b)
    return all(np.array_equal(np.asarray(x), np.asarray(y)) for x, y in zip(fa, fb))


def test_qenc_validation():
    with pytest.raises(ValueError, match="freeze_encoder"):
        Trainer(_cfg(qenc="bf16", freeze_encoder=False), 1, mesh=_mesh1())
    with pytest.raises(ValueError, match="ff_effnet family"):
        Trainer(_cfg(qenc="bf16", model_name="ff_redweb"), 1, mesh=_mesh1())
    with pytest.raises(ValueError, match="mutually exclusive"):
        Trainer(_cfg(qenc="bf16", qres="int8"), 1, mesh=_mesh1())
    with pytest.raises(ValueError, match="qenc must be"):
        Trainer(_cfg(qenc="fp8"), 1, mesh=_mesh1())


@pytest.mark.slow
def test_qenc_bf16_step_trains_decoder_only():
    trainer = Trainer(_cfg(qenc="bf16"), steps_per_epoch=2, mesh=_mesh1())
    state = trainer.init_state()
    # the step donates its input state: snapshot host copies up front
    enc_p0 = jax.device_get(state.params["encoder"])
    enc_s0 = jax.device_get(state.batch_stats["encoder"])
    dec_p0 = jax.device_get(state.params["decoder"])
    dec_s0 = jax.device_get(state.batch_stats["decoder"])
    ds = SyntheticDepthDataset(n=16, image_size=S, seed=1)
    it = BatchIterator(ds, 8, seed=0)

    losses = []
    s = state
    for _ in range(12):
        s, m = trainer.train_step(s, trainer.shard_batch(next(it)))
        assert bool(m.finite)
        losses.append(float(m.loss))
    it.close()

    # learns (decoder-only): loss decreases on the stream
    assert np.mean(losses[-3:]) < np.mean(losses[:3]), losses
    # encoder FULLY frozen: params (incl. BN affine) and running stats
    assert _leaves_equal(enc_p0, s.params["encoder"])
    assert _leaves_equal(enc_s0, s.batch_stats["encoder"])
    # decoder actually moved: params and stats
    assert not _leaves_equal(dec_p0, s.params["decoder"])
    assert not _leaves_equal(dec_s0, s.batch_stats["decoder"])


@pytest.mark.slow
def test_qenc_int8_requires_prepare_then_runs():
    trainer = Trainer(_cfg(qenc="int8"), steps_per_epoch=2, mesh=_mesh1())
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=8, image_size=S, seed=2)
    batch = trainer.shard_batch(
        {k: np.stack([ds[i][k] for i in range(8)]) for k in ("image", "gt", "mask")}
    )
    with pytest.raises(RuntimeError, match="prepare_qenc"):
        trainer.train_step(state, batch)

    calib = np.stack([ds[i]["image"] for i in range(8)])
    trainer.prepare_qenc(state, calib)
    enc_p0 = jax.device_get(state.params["encoder"])  # step donates state
    dec_p0 = jax.device_get(state.params["decoder"])
    s, m = trainer.train_step(state, batch)
    assert bool(m.finite) and np.isfinite(float(m.loss))
    # int8-packed encoder is a captured constant; state encoder untouched
    assert _leaves_equal(enc_p0, s.params["encoder"])
    assert not _leaves_equal(dec_p0, s.params["decoder"])


@pytest.mark.slow
def test_qenc_bf16_resident_chain_compatible():
    """The production resident path must accept qenc (the probe targets
    exactly that steady-state step)."""
    from pldepth_tpu.data import build_resident_store

    trainer = Trainer(_cfg(qenc="bf16"), steps_per_epoch=2, mesh=_mesh1())
    state = trainer.init_state()
    enc_p0 = jax.device_get(state.params["encoder"])  # chain donates state
    ds = SyntheticDepthDataset(n=8, image_size=S, seed=3)
    store = build_resident_store(ds, trainer.mesh)
    chain = trainer.resident_chain(3)
    s, m = chain(state, store.arrays)
    assert np.isfinite(np.asarray(jax.device_get(m.loss))).all()
    assert _leaves_equal(enc_p0, s.params["encoder"])


def test_self_pretrain_encoder_export_roundtrip(tmp_path):
    """The drive_qenc self-pretrain flow (tools/drive_qenc.py): export ONLY
    the encoder subtree of a trained model as a backbone .npz, then start a
    fresh qenc trainer from it — encoder arrives pretrained, decoder stays at
    its own fresh random init (the gate trains it from scratch)."""
    from pldepth_tpu.models.pretrained import save_backbone

    donor = Trainer(_cfg(freeze_encoder=False), 1, mesh=_mesh1())
    dstate = donor.init_state()
    # perturb so "pretrained" is distinguishable from any seed-0 init
    dstate = dstate.replace(
        params=jax.tree.map(lambda x: x + 0.01, dstate.params)
    )
    path = str(tmp_path / "backbone.npz")
    n = save_backbone(
        path, jax.device_get(dstate.params), jax.device_get(dstate.batch_stats),
        prefixes=("params/encoder/", "batch_stats/encoder/"),
    )
    assert n > 0
    archive = np.load(path)
    assert all(
        k.startswith(("params/encoder/", "batch_stats/encoder/"))
        for k in archive.files
    )

    fresh = Trainer(_cfg(qenc="bf16", pretrained_path=path), 1, mesh=_mesh1())
    fstate = fresh.init_state()
    assert _leaves_equal(fstate.params["encoder"], dstate.params["encoder"])
    assert not _leaves_equal(fstate.params["decoder"], dstate.params["decoder"])

def test_pretrained_frozen_hints_qenc(tmp_path, caplog):
    """A pretrained frozen encoder WITHOUT qenc is exactly qenc's proven
    premise — the trainer should point at the measured option."""
    import logging

    from pldepth_tpu.models.pretrained import save_backbone

    donor = Trainer(_cfg(freeze_encoder=False), 1, mesh=_mesh1())
    dstate = donor.init_state()
    path = str(tmp_path / "backbone.npz")
    save_backbone(
        path, jax.device_get(dstate.params), jax.device_get(dstate.batch_stats),
        prefixes=("params/encoder/", "batch_stats/encoder/"),
    )
    with caplog.at_level(logging.INFO, logger="pldepth_tpu.train.trainer"):
        Trainer(_cfg(pretrained_path=path), 1, mesh=_mesh1())
    assert any("--qenc bf16" in m for m in caplog.messages)
    caplog.clear()
    with caplog.at_level(logging.INFO, logger="pldepth_tpu.train.trainer"):
        Trainer(_cfg(qenc="bf16", pretrained_path=path), 1, mesh=_mesh1())
    assert not any("--qenc bf16 runs" in m for m in caplog.messages)

    with pytest.raises(ValueError, match="no tensors matched"):
        save_backbone(path, jax.device_get(dstate.params),
                      jax.device_get(dstate.batch_stats),
                      prefixes=("params/nonexistent/",))
