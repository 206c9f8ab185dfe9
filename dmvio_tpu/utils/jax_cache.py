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


def _host_tag() -> str:
    """Platform + CPU-feature fingerprint subdirectory.

    XLA:CPU AOT entries embed the build machine's ISA features; loading
    (or even writing next to) entries produced on a different host can
    SIGILL/abort the process — observed as deterministic pytest crashes in
    put_executable_and_time after this VM migrated to a host with fewer
    AVX512 extensions. Partitioning by a cpuinfo-flags hash makes a
    migrated VM start a fresh cache instead of tripping on the old one."""
    import hashlib

    import jax

    try:
        backend = jax.default_backend()
    except Exception:
        backend = "unknown"
    tag = backend
    if backend == "cpu":
        try:
            with open("/proc/cpuinfo") as f:
                flags = next((ln for ln in f if ln.startswith("flags")), "")
            tag += "-" + hashlib.sha1(flags.encode()).hexdigest()[:10]
        except OSError:
            pass
    return tag


def enable(cache_dir: str | None = None) -> None:
    """Turn on the persistent compilation cache (idempotent, best-effort)."""
    import jax

    env = os.environ.get("DMVIO_XLA_CACHE", _DEFAULT_DIR)
    if not cache_dir and env.strip().lower() in ("", "0", "off", "none"):
        # Explicit opt-out. The pytest suite runs with the cache OFF
        # (tests/conftest.py): cache-entry serialization has segfaulted
        # the CPython process deterministically on this image's XLA:CPU
        # when writing one of the large fused executables late in a
        # many-compile process (observed twice at the same suite
        # position, fresh cache dir, fine standalone) — a native-layer
        # bug correctness cannot depend on.
        return
    path = cache_dir or env
    try:
        path = os.path.join(path, _host_tag())
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.2)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    except Exception:
        pass   # older jax or read-only fs: run without the cache
