"""Device mesh and sharding helpers.

The reference's entire concurrency model is two asyncio semaphores
(jobs_store.py:19-20); the TPU-native equivalent is SPMD data parallelism:
track batches sharded over a 1-D ``dp`` mesh axis with `jax.sharding`, XLA
inserting any collectives.  No hand-written comm layer exists or is needed
(SURVEY §5.8).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(n_devices: int | None = None, axis: str = "dp",
              local_only: bool = False) -> Mesh:
    """1-D mesh.  ``local_only=True`` restricts it to THIS process's
    devices — the serving-engine layout: an HTTP request lands on one
    process, and a jit over non-addressable (other-host) devices cannot be
    driven from one process alone (SPMD programs require every process to
    execute the same computation).  Pod-wide meshes remain available for
    SPMD batch scripts via :func:`make_pod_mesh`."""
    devs = jax.local_devices() if local_only else jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis,))


def make_mesh2d(dp: int, sp: int, axes: tuple[str, str] = ("dp", "sp")) -> Mesh:
    """2-D mesh for batched long-track mastering: outer ``dp`` axis carries
    the batch (one track per row), inner ``sp`` axis time-shards each track.
    Keep ``sp`` on the ICI-adjacent (last, fastest-varying) dimension so the
    halo ``ppermute`` and gating ``psum`` ride ICI neighbors."""
    devs = jax.devices()[: dp * sp]
    if len(devs) < dp * sp:
        raise ValueError(f"need {dp * sp} devices, have {len(devs)}")
    return Mesh(np.array(devs).reshape(dp, sp), axes)


def init_distributed(coordinator: str | None = None,
                     num_processes: int | None = None,
                     process_id: int | None = None) -> bool:
    """Initialize ``jax.distributed`` for multi-host pods.

    The reference never runs multi-host (one uvicorn worker,
    run_production.py:14-16); here a pod is just more dp rows.  Call once
    per process before any device use.  With no coordinator configured (the
    single-host common case, and all tests) this is a no-op returning
    False.  ``coordinator="auto"`` calls ``jax.distributed.initialize()``
    with no arguments — it auto-detects from the TPU metadata/cluster env
    (GKE/TPU VM deployments).
    """
    if coordinator is None and num_processes is None:
        return False
    kw = {}
    if coordinator and coordinator != "auto":
        kw["coordinator_address"] = coordinator
    if num_processes is not None:
        kw["num_processes"] = int(num_processes)
    if process_id is not None:
        kw["process_id"] = int(process_id)
    jax.distributed.initialize(**kw)
    return True


def pod_layout(devices, sp: int | None = None) -> np.ndarray:
    """Arrange a (possibly multi-host) device list into a (dp, sp) grid.

    Rule (docs/SCALING.md): **sp must ride ICI, dp tolerates DCN** — the
    halo ``ppermute`` / gating ``psum`` of the time-shard path must stay
    within one host's ICI domain, while data-parallel rows never
    communicate.  So devices are grouped by ``process_index`` and each sp
    row is drawn from a single process; dp is the cross-host axis.

    ``sp=None`` picks the largest per-host sp that divides the per-host
    device count (i.e. a whole host per row when counts are uniform).
    Pure-layout helper (takes any objects with ``process_index``) so tests
    can validate pod geometry without multi-process JAX.
    """
    devices = list(devices)
    by_proc: dict[int, list] = {}
    for d in devices:
        by_proc.setdefault(int(getattr(d, "process_index", 0)), []).append(d)
    counts = {len(v) for v in by_proc.values()}
    if len(counts) != 1:
        raise ValueError(f"uneven devices per process: "
                         f"{ {k: len(v) for k, v in by_proc.items()} }")
    per_host = counts.pop()
    if sp is None:
        sp = per_host
    if per_host % sp:
        raise ValueError(f"sp={sp} does not divide the per-host device "
                         f"count {per_host}; an sp row would straddle hosts "
                         f"and put halo exchange on DCN")
    rows = []
    for pid in sorted(by_proc):
        host = by_proc[pid]
        for i in range(0, per_host, sp):
            rows.append(host[i:i + sp])
    return np.array(rows, dtype=object)


def make_pod_mesh(sp: int | None = None,
                  axes: tuple[str, str] = ("dp", "sp")) -> Mesh:
    """(dp, sp) mesh over ALL processes' devices, sp confined to ICI.

    Single-host this degenerates to ``make_mesh2d(n_local // sp, sp)``;
    multi-host (after :func:`init_distributed`) dp spans hosts so the only
    cross-host traffic is job I/O, never collectives."""
    return Mesh(pod_layout(jax.devices(), sp), axes)


def shard_batch(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for [B, C, N] batches: batch axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
