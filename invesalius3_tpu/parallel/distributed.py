"""Multi-host (multi-process) runtime initialization and hybrid meshes.

Single-host multi-chip needs nothing beyond ``jax.devices()``; a TPU pod
slice spans hosts, and every process must join one ``jax.distributed``
cluster before the first device op so collectives ride ICI within a slice
and DCN across slices.  This is the framework's analog of the reference's
multiprocessing pool bootstrap (reference surface.py:1360-1430) at pod
scale — the pool becomes a global mesh, the queue becomes sharding.

Usage (one call at process start, before any jax array op):

    from invesalius3_tpu.parallel import distributed
    distributed.initialize()                 # env-driven (TPU pods: zero-config)
    mesh = distributed.global_mesh(("data", "z"))

On Cloud TPU the coordinator/process count/process id all come from the
TPU metadata and ``jax.distributed.initialize()`` needs no arguments; on
other platforms they come from the standard env vars
(JAX_COORDINATOR_ADDRESS / JAX_NUM_PROCESSES / JAX_PROCESS_ID, or the
explicit keyword arguments).
"""

from __future__ import annotations

import os
from typing import Optional, Sequence, Tuple

import numpy as np

_initialized = False


def is_multiprocess_env() -> bool:
    """True when env/platform indicates a multi-process JAX cluster."""
    if os.environ.get("JAX_NUM_PROCESSES", ""):
        try:
            return int(os.environ["JAX_NUM_PROCESSES"]) > 1
        except ValueError:
            return False
    return bool(os.environ.get("JAX_COORDINATOR_ADDRESS"))


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Join the jax.distributed cluster (idempotent).

    Returns True if a multi-process runtime was initialized, False when
    running single-process (the common CLI case) — callers need no branch,
    ``jax.devices()`` just reflects the outcome.
    """
    global _initialized
    if _initialized:
        return True
    if coordinator_address is None:
        coordinator_address = os.environ.get("JAX_COORDINATOR_ADDRESS") or None
    if num_processes is None and os.environ.get("JAX_NUM_PROCESSES"):
        num_processes = int(os.environ["JAX_NUM_PROCESSES"])
    if process_id is None and os.environ.get("JAX_PROCESS_ID"):
        process_id = int(os.environ["JAX_PROCESS_ID"])

    # TPU pod slices span hosts exactly when the worker-hostname list has
    # more than one entry; a single-host slice needs no cluster.
    hostnames = os.environ.get("TPU_WORKER_HOSTNAMES", "")
    on_tpu_pod = "," in hostnames or bool(
        os.environ.get("MEGASCALE_COORDINATOR_ADDRESS"))
    if not (coordinator_address or on_tpu_pod or (num_processes or 0) > 1):
        return False  # single-process

    import jax

    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    _initialized = True
    return True


def process_info() -> Tuple[int, int]:
    """(process_id, num_processes) of the current runtime."""
    import jax

    return jax.process_index(), jax.process_count()


def global_mesh(axis_names: Tuple[str, ...] = ("z",),
                shape: Optional[Sequence[int]] = None):
    """Mesh over ALL processes' devices (global), laid out so the trailing
    axis stays within a host/slice (ICI) and leading axes cross hosts
    (DCN) — collectives along "z"/"model" ride ICI, data-parallel
    all-reduces take the slower DCN hop, matching the bandwidth hierarchy.
    """
    import jax
    from jax.sharding import Mesh

    devices = jax.devices()
    n = len(devices)
    if shape is None:
        if len(axis_names) == 1:
            shape = (n,)
        else:
            per_host = max(1, n // max(1, jax.process_count()))
            lead = n // per_host
            shape = (lead,) + (1,) * (len(axis_names) - 2) + (per_host,)
    order = sorted(  # host-major order: trailing axis intra-host
        range(n), key=lambda i: (getattr(devices[i], "process_index", 0),
                                 getattr(devices[i], "id", i)))
    arr = np.empty(n, dtype=object)
    for j, i in enumerate(order):
        arr[j] = devices[i]
    return Mesh(arr.reshape(shape), axis_names)


def local_data_slice(global_batch: int) -> slice:
    """The [start, stop) rows of a globally-sharded batch this process
    should feed (host-local input pattern for multi-host data loading)."""
    import jax

    pid, n = jax.process_index(), jax.process_count()
    if global_batch % n:
        raise ValueError(f"global_batch {global_batch} must divide evenly "
                         f"over {n} processes (rows would be dropped)")
    per = global_batch // n
    return slice(pid * per, (pid + 1) * per)
