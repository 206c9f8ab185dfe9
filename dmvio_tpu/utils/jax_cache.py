"""Persistent XLA compilation cache setup.

The pipeline is a fixed set of jitted programs; their compiles dominate
cold-start (the windowed-BA program alone is ~15-20s on TPU). Enabling
JAX's persistent compilation cache makes every process after the first
start near-instantly — the moral equivalent of the reference shipping
compiled C++ (no per-run JIT at all).
"""

from __future__ import annotations

import os

_DEFAULT_DIR = os.path.join(
    os.path.expanduser("~"), ".cache", "dmvio_tpu_xla")


def enable(cache_dir: str | None = None) -> None:
    """Turn on the persistent compilation cache (idempotent, best-effort)."""
    import jax

    path = cache_dir or os.environ.get("DMVIO_XLA_CACHE", _DEFAULT_DIR)
    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass   # older jax or read-only fs: run without the cache
