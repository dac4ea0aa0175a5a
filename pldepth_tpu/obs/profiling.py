"""Profiling hooks: jax.profiler traces + per-step timing.

The reference disabled profiling outright (TensorBoard callback with
profile_batch=0, pldepth/util/tracking_utils.py:39). TPU-native equivalent:
``profile_trace`` wraps a region in a jax.profiler trace (xplane dump
viewable in TensorBoard/xprof), ``step_timer`` measures device-synced step
latency.
"""

from __future__ import annotations

import contextlib
import time
from typing import Iterator

import jax


@contextlib.contextmanager
def profile_trace(logdir: str) -> Iterator[None]:
    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


@contextlib.contextmanager
def step_timer(sink, name: str = "step"):
    """Times a block including device completion (block_until_ready must be
    called by the block on its outputs for accuracy; we sync all devices)."""
    t0 = time.perf_counter()
    yield
    # fence EVERY device: a single device_put lands on the default device
    # only, so straggler devices' tail work would be excluded
    for d in jax.local_devices():
        (jax.device_put(0.0, d) + 0).block_until_ready()
    sink({f"{name}_time_s": time.perf_counter() - t0})
