"""Child process for tests/test_v5e16_config.py: build the v5e-16 mesh
(16 virtual CPU devices — the session conftest pins 8, so this runs in its
own process) from the checked-in BASELINE config #5 and run one train step
plus one sharded predict at reduced size.
"""

import json
import os
import sys

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_num_cpu_devices", 16)


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    sys.path.insert(0, repo)
    import numpy as np

    from pldepth_tpu.core.cache import enable_compilation_cache
    from pldepth_tpu.core.config import ExperimentConfig
    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
    from pldepth_tpu.train import Trainer

    enable_compilation_cache()
    assert len(jax.devices()) == 16, jax.devices()

    with open(
        os.path.join(repo, "configs", "ff_effnet_b4_640_v5e16.json")
    ) as f:
        raw = json.load(f)
    # reduced size for CI; everything structural (model family, mesh
    # layout, sampler, schedule, dtype policy) comes from the config
    raw.update(
        input_size=96, batch_size=16, epochs=1, dataset="synthetic",
        ds_size=16, rankings_per_image=8,
    )
    cfg = ExperimentConfig.from_dict(raw)
    assert cfg.model_name == "ff_effnet_b4"
    assert cfg.mesh.data == 16 and cfg.mesh.model == 1

    trainer = Trainer(cfg, steps_per_epoch=1)
    assert trainer.mesh.shape["data"] == 16
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=16, image_size=cfg.input_size, seed=0)
    it = BatchIterator(ds, cfg.batch_size, seed=0)
    host_batch = next(it)
    it.close()

    state, metrics = trainer.train_step(state, trainer.shard_batch(host_batch))
    loss = float(metrics.loss)
    assert np.isfinite(loss), loss
    assert bool(metrics.finite)

    pred = np.asarray(
        jax.device_get(
            trainer.jit_predict(fused="bn_fold")(state, host_batch["image"])
        )
    )
    assert pred.shape == (16, cfg.input_size, cfg.input_size), pred.shape
    assert np.isfinite(pred).all()
    print(json.dumps({"ok": True, "loss": loss, "devices": 16}))


if __name__ == "__main__":
    main()
