"""Multi-host (multi-process) runtime initialization.

The reference scales within one CPU (IndexThreadReduce worker threads);
the TPU-native framework scales the same residual/point axis over chips
AND hosts. Cross-host execution in JAX needs one extra runtime step: every
process calls jax.distributed.initialize() before first backend use, after
which jax.devices() spans the whole slice and the GSPMD programs in
parallel/dist_ba.py run unchanged with their dp axis riding DCN.

This module is that seam. It is environment-triggered so the same
run_dataset CLI works single-host (no env, no-op) and multi-host
(launcher exports the three DMVIO_* variables per process — the same
contract as torchrun/mpirun rank files):

    DMVIO_COORDINATOR   host:port of process 0 (e.g. "10.0.0.1:8476")
    DMVIO_NUM_PROCESSES total process count
    DMVIO_PROCESS_ID    this process's rank in [0, num_processes)

On TPU pods where the runtime provides cluster metadata, plain
jax.distributed.initialize() with no arguments also works; set
DMVIO_DIST=auto to request that.
"""

from __future__ import annotations

import os

_initialized = False


def maybe_initialize(coordinator: str = None, num_processes: int = None,
                     process_id: int = None) -> bool:
    """Initialize jax.distributed from args or DMVIO_* env vars.

    Returns True when a multi-process runtime was (or already is) set up,
    False for the single-process default. Idempotent."""
    global _initialized
    if _initialized:
        return True
    import jax

    if os.environ.get("DMVIO_DIST", "").lower() == "auto":
        # Cluster auto-detection (TPU pod / GKE metadata).
        jax.distributed.initialize()
        _initialized = True
        return True
    coordinator = coordinator or os.environ.get("DMVIO_COORDINATOR")
    if num_processes is None:
        num_processes = int(os.environ.get("DMVIO_NUM_PROCESSES", "0") or 0)
    if process_id is None:
        pid = os.environ.get("DMVIO_PROCESS_ID")
        process_id = int(pid) if pid is not None else None
    if not coordinator or not num_processes:
        return False
    if process_id is None:
        raise ValueError(
            "DMVIO_COORDINATOR/DMVIO_NUM_PROCESSES set but "
            "DMVIO_PROCESS_ID missing")
    jax.distributed.initialize(coordinator_address=coordinator,
                               num_processes=num_processes,
                               process_id=process_id)
    _initialized = True
    return True


def is_multiprocess() -> bool:
    import jax

    try:
        return jax.process_count() > 1
    except Exception:
        return False
