"""Multi-host (multi-process) launch path.

The reference launches one OS process and fans out rayon threads
(``/root/reference/src/main.rs:39-59``). The TPU-native equivalent spans
*hosts*: each host runs one controller process over its local chips,
``jax.distributed.initialize`` wires the processes into a single JAX runtime
(DCN for control/ICI for data), and the existing ``shard_map`` renderers in
:mod:`pathtrace_tpu.parallel.sharding` run unchanged over a global mesh.

Design rules (SURVEY §5 comm-backend mapping):

* The only hot collective in the framework is the ``psum`` of per-pixel
  radiance sums over the ``sp`` axis. :func:`make_global_mesh` therefore lays
  devices out hosts-major so that every ``sp`` group is *within one host*
  whenever it fits (``sp <= local device count``) — the psum rides ICI, never
  DCN. The ``dp`` axis has no collective at all, so it is free to span hosts.
* Everything is idempotent and degrades to single-process: with one process
  :func:`initialize` is a no-op and :func:`make_global_mesh` equals
  :func:`pathtrace_tpu.parallel.sharding.make_mesh`.

Launch recipe (one command per host)::

    python -m pathtrace_tpu render ... \
        --coordinator host0:9876 --num-processes 4 --process-id $i

or set the standard JAX cluster env (``JAX_COORDINATOR_ADDRESS`` etc. /
TPU-pod metadata) and call :func:`initialize` with no arguments.
"""

from __future__ import annotations

import os
from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh

_INITIALIZED = False


def initialize(
    coordinator_address: Optional[str] = None,
    num_processes: Optional[int] = None,
    process_id: Optional[int] = None,
    local_device_ids=None,
) -> None:
    """Join (or form) a multi-process JAX cluster. Idempotent.

    Arguments default to the ``PT_COORDINATOR`` / ``PT_NUM_PROCESSES`` /
    ``PT_PROCESS_ID`` environment variables, falling back to JAX's own
    cluster auto-detection (TPU pod metadata, ``JAX_COORDINATOR_ADDRESS``).
    A no-op when neither arguments nor environment request distribution, so
    single-host entry points can call it unconditionally.
    """
    global _INITIALIZED
    if _INITIALIZED:
        return
    coordinator_address = coordinator_address or os.environ.get("PT_COORDINATOR")
    if num_processes is None and "PT_NUM_PROCESSES" in os.environ:
        num_processes = int(os.environ["PT_NUM_PROCESSES"])
    if process_id is None and "PT_PROCESS_ID" in os.environ:
        process_id = int(os.environ["PT_PROCESS_ID"])
    if coordinator_address is None and num_processes is None:
        # Nothing requested; stay single-process (jax.distributed's own env /
        # pod auto-detection still applies if the user exported it).
        if os.environ.get("JAX_COORDINATOR_ADDRESS"):
            jax.distributed.initialize()
            _INITIALIZED = True
        return
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    _INITIALIZED = True


def is_distributed() -> bool:
    return jax.process_count() > 1


def make_global_mesh(dp: Optional[int] = None, sp: Optional[int] = None) -> Mesh:
    """A ``(dp, sp)`` mesh over *all* processes' devices, hosts-major.

    Devices are ordered ``(process_index, device id)`` and reshaped so each
    run of ``sp`` consecutive devices — one ``psum`` group — sits on a single
    host whenever ``sp`` divides the per-host device count: the sample-merge
    collective stays on ICI and only the collective-free ``dp`` axis crosses
    DCN. Falls back to the plain device order (with a warning comment in the
    error) when ``sp`` cannot be host-contained.
    """
    devices = sorted(jax.devices(), key=lambda d: (d.process_index, d.id))
    n = len(devices)
    if dp is None and sp is None:
        dp, sp = n, 1
    elif dp is None:
        dp = n // sp
    elif sp is None:
        sp = n // dp
    if dp * sp != n:
        raise ValueError(f"mesh {dp}x{sp} != {n} devices")
    local = max(
        sum(1 for d in devices if d.process_index == p)
        for p in {d.process_index for d in devices}
    )
    if sp > 1 and (local % sp) and (sp % local):
        raise ValueError(
            f"sp={sp} cannot be host-contained with {local} devices/host; "
            "the sample psum would ride DCN — pick sp dividing the per-host "
            "device count (or a multiple of it)"
        )
    return Mesh(np.asarray(devices).reshape(dp, sp), ("dp", "sp"))


def host_shard_to_global(x, mesh: Mesh, spec):
    """Build a global array from a host-replicated numpy value.

    Every process passes the same full-size ``x``; each device materializes
    only its shard. This is how the sharded entry points feed pixel/sample
    offset vectors to a mesh that spans processes."""
    from jax.sharding import NamedSharding

    sharding = NamedSharding(mesh, spec)
    x = np.asarray(x)
    return jax.make_array_from_callback(x.shape, sharding, lambda idx: x[idx])


def gather_global(x) -> np.ndarray:
    """Fetch a (possibly cross-process) sharded array to every host."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
