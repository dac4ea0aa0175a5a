"""Ordinal depth relations with the WHDR ratio test.

Vectorized equivalent of the reference's scalar
``get_depth_relation(depth1, depth2, threshold)``
(pldepth/data/depth_utils.py:5-21): relation is +1 if d1/d2 >= 1+tau,
-1 if d1/d2 <= 1/(1+tau), else 0 ("equally distant"), with a 1e-10 epsilon
guard on both depths. tau defaults to 0.03 as in Xian et al., 2020
(pldepth/data/sampling.py:179-185).
"""

from __future__ import annotations

import jax.numpy as jnp

_EPS = 1e-10


def depth_relation(d1, d2, threshold: float | None = None):
    """Elementwise ordinal relation in {-1, 0, +1} (int8)."""
    d1 = jnp.asarray(d1, jnp.float32)
    d2 = jnp.asarray(d2, jnp.float32)
    if threshold is None:
        return jnp.sign(d1 - d2).astype(jnp.int8)
    ratio = (d1 + _EPS) / (d2 + _EPS)
    hi = 1.0 + threshold
    rel = jnp.where(ratio >= hi, 1, jnp.where(ratio <= 1.0 / hi, -1, 0))
    return rel.astype(jnp.int8)
