"""Device-mesh helpers for data-parallel proposal rounds.

One mesh axis (``'q'``) shards the proposal batch: every per-lane array in
a round (starts, axes, candidate buffers, per-lane counters) is partitioned
along its leading dimension, so the user's batched log-likelihood runs on
all chips with XLA inserting the (cheap) ``all-reduce`` collectives needed
by the round's convergence tests (``jnp.any(active)``).

The fused round keeps a clean parallel/sequential split:

* everything lane-indexed (proposal candidates, walk/slice state, the
  batched likelihood evaluation) is constrained to ``P('q')`` — each chip
  owns ``q / n_devices`` lanes end to end, so the hot path needs NO
  communication except the tiny ``jnp.any``-style convergence reductions;
* the consume scan (worst-point selection, evidence update) runs on the
  replicated live state: the per-lane results are all-gathered once per
  round (a few KB), which rides the ICI and is negligible next to a
  likelihood batch.

This replaces the reference's process pool (``pool.py:51-184``) where the
parallel axis is worker processes and the gather is pickled IPC.
"""

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec

__all__ = ["make_mesh", "batch_sharding", "shard_batch", "lane_constrainer",
           "replicate"]

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


def lane_constrainer(mesh):
    """Traceable ``constrain(x)`` pinning an array's leading (lane) axis
    to the mesh, or None when ``mesh`` is None.  Applied inside jitted
    kernels at the points where per-lane state is created, so XLA's SPMD
    partitioner propagates the sharding through the walk/slice loops and
    the batched likelihood."""
    if mesh is None:
        return None
    def constrain(x):
        if x is None:
            return None
        spec = PartitionSpec(BATCH_AXIS, *([None] * (x.ndim - 1)))
        return jax.lax.with_sharding_constraint(
            x, NamedSharding(mesh, spec))
    return constrain


def replicate(mesh, x):
    """Constrain ``x`` (any pytree) to fully-replicated on the mesh."""
    sh = NamedSharding(mesh, PartitionSpec())
    return jax.tree.map(
        lambda a: jax.lax.with_sharding_constraint(a, sh)
        if a is not None else None, x)


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
