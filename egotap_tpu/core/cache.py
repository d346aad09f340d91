"""Persistent XLA compilation cache.

Compiles of the fused programs take minutes through the CI's remote-compile
relay; caching them on disk makes repeat runs (bench, CLIs, the driver's
entry checks) start in seconds.
"""

from __future__ import annotations

import os

import jax

_DEFAULT_DIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.dirname(os.path.abspath(__file__)))), ".jax_cache")


def enable_compilation_cache(path: str | None = None) -> None:
    # TPU-only: CPU AOT artifacts cached from the remote-compile machine
    # carry CPU-feature flags this host may lack (risk of SIGILL), and CPU
    # compiles are fast anyway.
    try:
        if jax.default_backend() != "tpu":
            return
    except Exception:
        return
    path = path or os.environ.get("EGOTAP_JAX_CACHE", _DEFAULT_DIR)
    os.makedirs(path, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", path)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
