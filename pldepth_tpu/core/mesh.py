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


def data_sharding(mesh: Mesh, ndim: int = 1) -> NamedSharding:
    """Shard leading (batch) dim over the data axis, replicate the rest."""
    spec = P(mesh.axis_names[0], *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def replicated_sharding(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch):
    """Place a pytree of host arrays onto the mesh, batch-sharded on dim 0."""
    def put(x):
        return jax.device_put(x, data_sharding(mesh, np.ndim(x)))

    return jax.tree_util.tree_map(put, batch)
