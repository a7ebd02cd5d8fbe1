"""Persistent XLA compilation cache setup.

TPU compiles of the fused chunk programs take minutes through the remote
compiler; enabling jax's persistent cache makes every rerun (bench, driver,
demos) reuse the compiled executables.
"""
from __future__ import annotations

import os


def enable_compilation_cache(path: str | None = None):
    import jax

    path = path or os.environ.get(
        "DEEPDISH_JAX_CACHE",
        os.path.join(os.path.dirname(__file__), "..", "..", ".jax_cache"))
    path = os.path.abspath(path)
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    except AttributeError:
        pass
    return path
