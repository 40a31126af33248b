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
    global _DONE
    if _DONE:
        return
    _DONE = True
    cache = Path(cache_dir or os.environ.get(
        "NONODE_COMPILE_CACHE", Path.home() / ".cache" / "nonode_tpu_xla"))
    try:
        cache.mkdir(parents=True, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", str(cache))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception as e:  # cache is best-effort
        print(f"compilation cache disabled: {e}")
