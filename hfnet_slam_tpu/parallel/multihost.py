"""Multi-host runtime: jax.distributed bring-up + DCN x ICI mesh layout.

The reference has no distributed backend at all — its parallelism is
std::thread + mutexes inside one process (SURVEY.md §2.4, §5.8;
/root/reference/src/System.cc:137-183). The TPU rebuild scales across
hosts instead: a single-controller-per-process JAX program where every
process calls `initialize()` once, then builds a mesh whose OUTER axis
spans hosts (collectives ride DCN) and whose INNER axis spans the chips
of one host (collectives ride ICI). Sharding the keyframe axis of
retrieval (parallel/retrieval.py) and the edge axis of BA
(parallel/dist_ba.py) over the inner axis keeps the heavy all-reduces on
ICI; only the tiny reduced camera system ever crosses DCN.

Single-process use (tests, the 8-way virtual CPU mesh, one real chip) is
the degenerate case: `initialize()` is a no-op and the DCN axis has
size 1, so every helper below works unchanged from one chip to a pod
slice — the scaling-book recipe of "pick a mesh, annotate shardings, let
XLA insert collectives" with the mesh picked here.
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh


def initialize(coordinator_address: str = None, num_processes: int = None,
               process_id: int = None, local_device_ids=None) -> bool:
    """Bring up the DCN control plane (jax.distributed.initialize).

    Returns True when a multi-process runtime was initialized, False for
    the single-process no-op. Arguments may be omitted when the standard
    cluster env vars are set (JAX_COORDINATOR_ADDRESS / NUM_PROCESSES /
    PROCESS_ID, or a TPU pod's automatic discovery).
    """
    explicit = coordinator_address or os.environ.get("JAX_COORDINATOR_ADDRESS")
    if not explicit and num_processes is None:
        return False  # single process: nothing to coordinate
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
        local_device_ids=local_device_ids,
    )
    return True


def shutdown():
    if jax.process_count() > 1:
        jax.distributed.shutdown()


def make_mesh(axis: str = "kf", devices=None) -> Mesh:
    """Flat 1-D mesh over all global devices (single-host or after
    initialize()). The workhorse for the sharded retrieval / dist-BA
    kernels, which only need one named axis."""
    devices = list(jax.devices()) if devices is None else list(devices)
    return Mesh(np.asarray(devices), (axis,))


def make_hybrid_mesh(dcn_axis: str = "host", ici_axis: str = "kf") -> Mesh:
    """2-D (hosts, chips-per-host) mesh: outer axis crosses DCN, inner
    axis stays on one host's ICI domain. Shard big arrays over `ici_axis`
    so their collectives never leave the host; reduce tiny results over
    `dcn_axis`.

    Falls back to (1, n_devices) in a single process so the same program
    runs anywhere.
    """
    n_proc = jax.process_count()
    if n_proc > 1:
        per_host = jax.local_device_count()
        try:
            from jax.experimental import mesh_utils

            dev = mesh_utils.create_hybrid_device_mesh(
                mesh_shape=(1, per_host),
                dcn_mesh_shape=(n_proc, 1),
                devices=jax.devices(),
            )
        except ValueError:
            # non-TPU backends carry no slice topology (CPU multi-process:
            # every device reports slice 0); group by owning process —
            # the same (host, chip) layout, minus the physical-ring
            # ordering only TPUs have
            devs = sorted(jax.devices(),
                          key=lambda d: (d.process_index, d.id))
            dev = np.asarray(devs).reshape(n_proc, per_host)
        return Mesh(dev, (dcn_axis, ici_axis))
    devices = np.asarray(jax.devices()).reshape(1, -1)
    return Mesh(devices, (dcn_axis, ici_axis))


def process_shard(n: int, process_index: int = None, process_count: int = None):
    """Contiguous [lo, hi) row range of a length-n axis owned by this
    process — the host-local slice of a globally sharded table (each host
    feeds only its own keyframe rows; no host ever materializes the full
    array)."""
    pi = jax.process_index() if process_index is None else process_index
    pc = jax.process_count() if process_count is None else process_count
    per = -(-n // pc)  # ceil
    lo = min(pi * per, n)
    return lo, min(lo + per, n)


def global_array(local_rows: np.ndarray, mesh: Mesh, axis: str = "kf"):
    """Assemble a globally sharded array from per-process local rows
    (jax.make_array_from_process_local_data): each host contributes the
    `process_shard` slice it owns; the result behaves like one (N, ...)
    array sharded over `axis` without any host holding all of it.

    In a single process this is just device_put with the axis sharding.
    """
    from jax.sharding import NamedSharding, PartitionSpec as P

    spec = P(axis, *([None] * (np.ndim(local_rows) - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(np.asarray(local_rows), sharding)
    return jax.make_array_from_process_local_data(
        sharding, np.asarray(local_rows))
