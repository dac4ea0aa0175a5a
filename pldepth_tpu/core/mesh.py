"""Device mesh construction and sharding helpers.

The reference trained on exactly one device (pldepth/PLDepth.py:176, plain
Keras ``fit``). This module is the TPU-native replacement: an ICI mesh with a
``data`` axis (batch sharding; XLA inserts the gradient psum) and a ``model``
axis reserved for larger backbones. All shardings are expressed as
``NamedSharding`` so the same jitted train step runs on 1 chip or a slice.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from pldepth_tpu.core.config import MeshConfig


def make_mesh(
    cfg: Optional[MeshConfig] = None, devices: Optional[Sequence[jax.Device]] = None
) -> Mesh:
    cfg = cfg or MeshConfig()
    devices = list(devices if devices is not None else jax.devices())
    n = len(devices)
    data = cfg.resolved_data(n)
    if data * cfg.model != n:
        raise ValueError(
            f"mesh {data}x{cfg.model} does not match {n} devices"
        )
    dev_array = np.asarray(devices).reshape(data, cfg.model)
    return Mesh(dev_array, axis_names=cfg.axis_names)


def warmup_collectives(mesh: Mesh) -> float:
    """Run one tiny all-device reduction to establish collective contexts.

    Multi-process backends create their cross-process communicator lazily at
    the first collective, with a bounded key-exchange deadline (Gloo on CPU:
    30s). If the first collective sits *after* a minutes-long train-step
    compile, processes can drift past that deadline and the context setup
    times out. Calling this right after ``jax.distributed.initialize`` —
    while processes are still in lockstep — creates and caches the context
    in seconds. No-op-cheap on single process. Returns the reduced value
    (= the data-axis length) so callers can sanity-check participation.
    """
    spec = P(mesh.axis_names[0])
    rows = mesh.shape[mesh.axis_names[0]]
    if jax.process_count() > 1:
        # assumes the data axis divides evenly over processes (the layout
        # make_mesh produces from jax.devices() ordering)
        local = np.ones((rows // jax.process_count(),), np.float32)
        arr = jax.make_array_from_process_local_data(
            NamedSharding(mesh, spec), local
        )
    else:
        arr = jax.device_put(np.ones((rows,), np.float32), NamedSharding(mesh, spec))
    total = jax.jit(lambda x: x.sum(), out_shardings=NamedSharding(mesh, P()))(arr)
    return float(jax.device_get(total))


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def round_batch(batch_size: int, mesh: Mesh) -> int:
    """Round a dispatch batch up to a multiple of the data-axis size (the
    sharded-serving batch must divide evenly over the mesh)."""
    n = mesh.shape[mesh.axis_names[0]]
    return ((batch_size + n - 1) // n) * n


def pad_to_batch(a: np.ndarray, batch_size: int, fill: float = 0.0) -> np.ndarray:
    """Pad the leading axis up to ``batch_size`` with ``fill`` so every
    dispatch keeps ONE compiled shape (the pad can exceed the tail length,
    which ``zeros_like(a[:pad])``-style padding silently got wrong)."""
    pad = batch_size - a.shape[0]
    if pad <= 0:
        return a
    return np.concatenate(
        [a, np.full((pad, *a.shape[1:]), fill, a.dtype)]
    )


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded on dim 0."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(put, batch)
