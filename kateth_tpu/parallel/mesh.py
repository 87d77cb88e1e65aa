"""Device-mesh helpers.

One canonical 1-D mesh with a single axis named "shard" covers this
library's needs: the MSM shards points over it, blob batches shard their
batch dimension over it.  Multi-host runs initialize jax.distributed and
build the same mesh over the global device set — the programs are
identical on 1 device, 8 local devices, or N hosts (ICI within a slice,
DCN across).
"""

from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

AXIS = "shard"


def make_mesh(devices=None, axis: str = AXIS) -> Mesh:
    """1-D mesh over the given (default: all) devices."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (axis,))


def local_mesh(n: int | None = None, axis: str = AXIS) -> Mesh:
    """Mesh over the first n local devices (all if n is None)."""
    devs = jax.devices()
    if n is not None:
        assert len(devs) >= n, f"need {n} devices, have {len(devs)}"
        devs = devs[:n]
    return make_mesh(devs, axis)


def distributed_init(coordinator: str | None = None, **kw) -> None:
    """Multi-host bring-up: jax.distributed.initialize (idempotent no-op on
    single-process runs where env auto-detection finds nothing)."""
    try:
        jax.distributed.initialize(coordinator_address=coordinator, **kw)
    except (ValueError, RuntimeError):
        pass  # already initialized or single-process


def shard_batch(mesh: Mesh, x, axis: str = AXIS):
    """Place an array (or pytree) with its leading dim sharded over the mesh."""
    spec = P(axis)
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P(axis, *([None] * (a.ndim - 1))))),
        x,
    )


def replicate(mesh: Mesh, x):
    """Place an array (or pytree) fully replicated over the mesh."""
    return jax.tree_util.tree_map(
        lambda a: jax.device_put(a, NamedSharding(mesh, P())), x
    )
