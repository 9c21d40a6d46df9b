"""Multi-host runtime scaffolding: jax.distributed init + DCN-aware meshes.

SURVEY.md §5.8: the reference has no multi-node layer at all; the blueprint
calls for jax.distributed + a device mesh whose inner axis rides ICI (within a
slice/host) and whose outer axis crosses DCN (between hosts), with the
track/pose shards laid out so the psum'd separator / reduced-camera collectives
stay on ICI and only the final (small) separator exchange crosses DCN.

This module provides:
- initialize(): idempotent jax.distributed.initialize from env/args
  (COORDINATOR_ADDRESS / JAX_COORDINATOR_ADDRESS, NUM_PROCESSES, PROCESS_ID —
  the standard TPU-pod env contract; no-op single-process when unset)
- host_mesh(axes): Mesh over all global devices with hosts factored onto the
  OUTER axis (DCN) and per-host devices on the inner axes (ICI)
- process_local_rows(n): contiguous row range owned by this process, for
  sharding host-side problem construction across processes

Single-process behavior is identical to plain Mesh(jax.devices()) — every code
path here runs (and is CI-tested) on the 8-virtual-device CPU mesh.
"""

import os
from typing import Optional, Sequence, Tuple

import numpy as np

import jax
from jax.sharding import Mesh

_initialized = False


def initialize(coordinator_address: Optional[str] = None,
               num_processes: Optional[int] = None,
               process_id: Optional[int] = None) -> bool:
    """Initialize jax.distributed if a multi-process env is configured.

    Returns True if running multi-process (after initialization), False for
    plain single-process use.  Safe to call more than once.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    addr = coordinator_address or os.environ.get(
        "COORDINATOR_ADDRESS") or os.environ.get("JAX_COORDINATOR_ADDRESS")
    nproc = num_processes if num_processes is not None else int(
        os.environ.get("NUM_PROCESSES", "0") or 0)
    pid = process_id if process_id is not None else int(
        os.environ.get("PROCESS_ID", "-1"))
    if addr and nproc > 1 and pid >= 0:
        jax.distributed.initialize(coordinator_address=addr,
                                   num_processes=nproc, process_id=pid)
        _initialized = True
        return True
    # Do NOT latch on the single-process fallback: a later call that supplies
    # explicit coordinator args must still be able to initialize.
    return False


def host_mesh(axis_names: Sequence[str] = ("hosts", "devices"),
              devices_per_host: Optional[int] = None) -> Mesh:
    """Mesh with the host (DCN) axis outermost and ICI axes inner.

    With one process this degenerates to a (1, n_devices) mesh — shard_map
    programs written against it are process-count agnostic: collectives over
    `devices` stay on ICI, collectives over `hosts` cross DCN only.
    """
    # jax.devices() ordering is NOT guaranteed contiguous by process on
    # multi-host pods; group explicitly by (process_index, id) so the outer
    # axis really is the DCN/host axis.
    devs = np.asarray(sorted(jax.devices(),
                             key=lambda d: (d.process_index, d.id)))
    n_hosts = jax.process_count()
    per_host = devices_per_host or (len(devs) // n_hosts)
    if len(axis_names) == 1:
        return Mesh(devs.reshape(-1), tuple(axis_names))
    grid = devs.reshape(n_hosts, per_host)
    return Mesh(grid, tuple(axis_names))


def flat_mesh(n: Optional[int] = None, axis: str = "shard") -> Mesh:
    """1-axis mesh over the first n global devices (default: all)."""
    devs = jax.devices()[: (n or len(jax.devices()))]
    return Mesh(np.asarray(devs), (axis,))


def process_local_rows(n_rows: int) -> Tuple[int, int]:
    """[start, end) range of problem rows this process should build/own.

    Host-side data construction (g2o/BAL parsing, structure planning) is
    duplicated per process in the simplest deployment; for out-of-core
    problems, each process builds only its slice and the separator metadata.
    """
    p, np_ = jax.process_index(), jax.process_count()
    per = -(-n_rows // np_)
    return p * per, min((p + 1) * per, n_rows)


def replicate_host_plan(plan_bytes: bytes) -> bytes:
    """Broadcast a pickled host-side plan from process 0 to all processes.

    Orderings/partitions must be IDENTICAL on all hosts (they parameterize
    compiled programs).  Uses a tiny all-gather of the plan hash to verify
    agreement when every process plans locally (deterministic planners), and
    is a hook for a real bcast when planners go nondeterministic.
    """
    if jax.process_count() == 1:
        return plan_bytes
    import hashlib
    import jax.numpy as jnp
    from jax.experimental import multihost_utils
    h = np.frombuffer(hashlib.sha256(plan_bytes).digest()[:8], dtype=np.int64)
    all_h = multihost_utils.process_allgather(jnp.asarray(h))
    if not np.all(all_h == all_h[0]):
        raise RuntimeError(
            "host-side plans diverged across processes; pass a seed or plan "
            "on process 0 and broadcast")
    return plan_bytes
