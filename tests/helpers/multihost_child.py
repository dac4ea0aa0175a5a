"""Child process for the multi-host (jax.distributed) train-step test.

Run as: python multihost_child.py <process_id> <num_processes> <port>

Each process owns 4 virtual CPU devices; collectives cross the process
boundary over Gloo — the same code path a real multi-host TPU pod uses
(modulo the transport), exercising BatchIterator host sharding and
Trainer.shard_batch's make_array_from_process_local_data branch.
"""

import os
import sys


def main() -> None:
    proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]

    flags = os.environ.get("XLA_FLAGS", "")
    if "collective_call_terminate" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
            " --xla_cpu_collective_call_terminate_timeout_seconds=1200"
        ).strip()

    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_num_cpu_devices", 4)
    cache = os.environ.get("PLDEPTH_JAX_CACHE")
    if cache:
        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5)
    jax.distributed.initialize(
        coordinator_address=f"localhost:{port}",
        num_processes=num_procs,
        process_id=proc_id,
    )
    assert jax.process_count() == num_procs
    assert len(jax.devices()) == 4 * num_procs
    assert len(jax.local_devices()) == 4

    import numpy as np

    from pldepth_tpu.core.config import ExperimentConfig, MeshConfig
    from pldepth_tpu.core.mesh import make_mesh, warmup_collectives
    from pldepth_tpu.data import BatchIterator, SyntheticDepthDataset
    from pldepth_tpu.train import Trainer

    size = 32
    n_dev = 4 * num_procs
    cfg = ExperimentConfig(
        model_name="ff_effnet",
        input_size=size,
        batch_size=4,  # per-process; global batch = 4 * num_procs
        ranking_size=3,
        rankings_per_image=4,
        sampling_type=1,
        freeze_encoder=False,
        compute_dtype="float32",
        listmle_impl="xla",
        initial_lr=1e-3,
        mesh=MeshConfig(data=n_dev, model=1),
    )
    mesh = make_mesh(cfg.mesh)

    # Establish the all-device Gloo context while the processes are still
    # in lockstep — see core.mesh.warmup_collectives for why (30s context
    # key-exchange deadline vs minutes of compile drift on a 1-core host).
    assert warmup_collectives(mesh) == float(n_dev)
    print(f"[{proc_id}] gloo context warm", flush=True)

    trainer = Trainer(cfg, steps_per_epoch=1, mesh=mesh)
    state = trainer.init_state()
    ds = SyntheticDepthDataset(n=16, image_size=size, seed=0)
    it = BatchIterator(
        ds, cfg.batch_size, seed=0, shard_index=proc_id, num_shards=num_procs
    )
    batch = trainer.shard_batch(next(it))
    it.close()

    # the global array spans all processes; this process holds its 4 shards
    assert batch["image"].shape[0] == 4 * num_procs
    local_shapes = {s.data.shape for s in batch["image"].addressable_shards}
    assert local_shapes == {(1, size, size, 3)}, local_shapes

    state, metrics = trainer.train_step(state, batch)
    loss = float(jax.device_get(metrics.loss))
    assert np.isfinite(loss)
    assert bool(jax.device_get(metrics.finite))

    # sharded serving across processes: shard_map'd forward on the global
    # batch; each process checks its addressable output shards
    pred = trainer.jit_predict()(state, batch["image"])
    assert pred.shape == (4 * num_procs, size, size)
    local = np.concatenate([np.asarray(s.data) for s in pred.addressable_shards])
    assert local.shape[0] == 4 and np.isfinite(local).all()
    print(f"[{proc_id}] serving sum={float(local.sum()):.6g}", flush=True)

    # replicated output: every process must report the identical loss
    print(f"CHILD {proc_id} OK loss={loss:.8f}", flush=True)


if __name__ == "__main__":
    main()
