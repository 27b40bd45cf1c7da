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


def make_mesh(n_devices: int | None = None, axis: str = "dp") -> Mesh:
    devs = jax.devices()
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


def shard_batch(mesh: Mesh, axis: str = "dp") -> NamedSharding:
    """Sharding for [B, C, N] batches: batch axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
