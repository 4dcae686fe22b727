"""Device-mesh helpers for data-parallel proposal rounds.

One mesh axis (``'q'``) shards the proposal batch: every per-lane array in
a round (starts, axes, candidate buffers, per-lane counters) is partitioned
along its leading dimension, so the user's batched log-likelihood runs on
all chips with XLA inserting the (cheap) ``all-reduce`` collectives needed
by the round's convergence tests (``jnp.any(active)``).
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "batch_sharding", "shard_batch"]

BATCH_AXIS = "q"


def make_mesh(n_devices=None, devices=None):
    """A 1-D mesh over ``n_devices`` (default: all available) with the
    proposal-batch axis."""
    if devices is None:
        devices = jax.devices()
        if n_devices is not None:
            devices = devices[:n_devices]
    return Mesh(np.asarray(devices), (BATCH_AXIS,))


def batch_sharding(mesh, ndim=2):
    """NamedSharding partitioning the leading (batch) dimension."""
    spec = PartitionSpec(BATCH_AXIS, *([None] * (ndim - 1)))
    return NamedSharding(mesh, spec)


def shard_batch(mesh, *arrays):
    """Place arrays on the mesh, sharded along their leading axis.

    Leading dimensions must be divisible by the mesh size.  Returns a
    single array when given one.
    """
    out = []
    for a in arrays:
        if a is None:
            out.append(None)
            continue
        a = np.asarray(a) if not isinstance(a, jax.Array) else a
        out.append(jax.device_put(a, batch_sharding(mesh, np.ndim(a))))
    return out[0] if len(out) == 1 else tuple(out)
