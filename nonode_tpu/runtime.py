"""Runtime bootstrap shared by all CLI entry points.

Enables the persistent XLA compilation cache so repeated invocations
(sweeps, fleets, only_test reruns) skip recompilation — per-process compile
is otherwise the dominant cost for short runs on this workload.
"""

from __future__ import annotations

import os
from pathlib import Path

import jax

_DONE = False


def bootstrap(cache_dir: str | None = None):
    """Enable the persistent compile cache on platforms that support it.

    DISABLED by default: on the axon TPU tunnel, enabling
    jax_compilation_cache_dir wedges the process on the first jit (verified
    empirically — even a trivial matmul hangs). Opt in by setting
    NONODE_COMPILE_CACHE to a directory on CPU/GPU/standard-TPU platforms.
    """
    global _DONE
    if _DONE:
        return
    _DONE = True
    cache = cache_dir or os.environ.get("NONODE_COMPILE_CACHE")
    if not cache:
        return
    try:
        Path(cache).mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        print(f"compilation cache disabled: {e}")
