"""Persistent XLA compilation cache setup.

Whole-image programs take 30–90 s to compile per shape bucket; the cache
amortizes that across CLI invocations (critical for the per-image timed
evaluation harness, reference cellseg_time_eval.py).
"""

from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None) -> None:
    import jax

    path = path or os.environ.get(
        "CELLSEG_COMPILE_CACHE", os.path.expanduser("~/.cache/cellseg_tpu_xla")
    )
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass
