"""Deterministic RNG plumbing.

The reference relied on global seeds (tf.random.set_seed at
pldepth/util/env.py:55, scattered np.random.seed calls). Here every random
decision flows from one root ``jax.random.key`` that is folded with stable
string tags and integer indices, so runs are reproducible regardless of
execution order, device count or host threading.
"""

from __future__ import annotations

import hashlib

import jax


def fold_in_str(key: jax.Array, tag: str) -> jax.Array:
    """Fold a string tag into a PRNG key (stable across processes)."""
    digest = hashlib.sha256(tag.encode("utf-8")).digest()
    word = int.from_bytes(digest[:4], "little")
    return jax.random.fold_in(key, word)


def train_step_key(root: jax.Array, step) -> jax.Array:
    return jax.random.fold_in(fold_in_str(root, "train_step"), step)
