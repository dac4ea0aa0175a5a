"""Persistent XLA compilation cache setup, shared by every entry point.

A 448² train-step compile takes minutes (longer through the TPU tunnel);
identical re-runs — restarts, sweeps, eval-after-train, repeated benches —
hit disk instead. One helper so the CLI and bench.py cannot drift onto
different cache locations (the cache is keyed by HLO + platform, so CPU
and TPU artifacts coexist in one directory).
"""

from __future__ import annotations

import logging
import os

log = logging.getLogger(__name__)

DEFAULT_CACHE_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "pldepth_tpu", "jax"
)


def enable_compilation_cache(min_compile_secs: int = 10) -> str | None:
    """Point JAX at the shared on-disk compilation cache.

    Honors ``PLDEPTH_JAX_CACHE`` (a directory, or ``0`` to disable).
    Returns the cache dir in use, or None when disabled/unavailable.
    """
    cache = os.environ.get("PLDEPTH_JAX_CACHE", DEFAULT_CACHE_DIR)
    if not cache or cache == "0":
        return None
    try:
        import jax

        jax.config.update("jax_compilation_cache_dir", cache)
        jax.config.update(
            "jax_persistent_cache_min_compile_time_secs", min_compile_secs
        )
        return cache
    except Exception as e:  # pragma: no cover
        log.warning("compilation cache off: %s", e)
        return None
