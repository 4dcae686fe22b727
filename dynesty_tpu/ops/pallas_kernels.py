"""Pallas TPU kernels for the framework's quadratic-cost geometry ops.

The friends-type bounds (RadFriends/SupFriends) need leave-one-out
nearest-neighbor distances over the live set (reference
``bounding.py:1683-1702``, via a KDTree).  Brute force is the right
shape for TPU — for the Euclidean case the pairwise matrix rides the MXU
through the ``|a|^2 + |b|^2 - 2 a.b`` expansion — and a Pallas kernel
tiles it so the full (N, N) matrix never materializes in HBM.

``pairwise_min_dist`` dispatches to the Pallas kernel on TPU (or under
``interpret=True`` for tests) and to a fused jnp fallback elsewhere.
"""

import functools

import numpy as np
import jax
import jax.numpy as jnp

try:
    from jax.experimental import pallas as pl
    _HAS_PALLAS = True
except ImportError:  # pragma: no cover
    _HAS_PALLAS = False

__all__ = ["pairwise_min_dist", "pairwise_min_dist_reference"]

_TILE = 256


def _min_dist_kernel_l2(pts_ref, block_ref, out_ref):
    """One row-block of leave-one-out L2 NN distances.

    ``block_ref``: (TILE, d) rows of this grid step; ``pts_ref``: the full
    (N, d) point set (VMEM); output (TILE,) min squared distances.
    """
    i = pl.program_id(0)
    block = block_ref[:]
    pts = pts_ref[:]
    # |a-b|^2 = |a|^2 + |b|^2 - 2 a.b ; the cross term uses the MXU
    cross = jnp.dot(block, pts.T, preferred_element_type=jnp.float32)
    a2 = jnp.sum(block * block, axis=1, keepdims=True)
    b2 = jnp.sum(pts * pts, axis=1)[None, :]
    sq = a2 + b2 - 2.0 * cross
    # mask self-distances (global row index == column index)
    tile = block.shape[0]
    n = pts.shape[0]
    rows = (jax.lax.broadcasted_iota(jnp.int32, (tile, n), 0) +
            i * tile)
    cols = jax.lax.broadcasted_iota(jnp.int32, (tile, n), 1)
    sq = jnp.where(rows == cols, jnp.inf, sq)
    out_ref[i, :] = jnp.min(sq, axis=1)


def _pairwise_min_l2_pallas(points, interpret=False):
    n, d = points.shape
    # centering reduces f32 cancellation in the |a|^2+|b|^2-2ab expansion
    points = points - jnp.mean(points, axis=0)
    npad = -(-n // _TILE) * _TILE
    pts = jnp.pad(points, ((0, npad - n), (0, 0)),
                  constant_values=1e30)  # far-away padding
    out = pl.pallas_call(
        _min_dist_kernel_l2,
        grid=(npad // _TILE,),
        in_specs=[
            # the full (padded) point set fits comfortably in VMEM for
            # realistic live-set sizes (16k x 64 x 4B = 4 MB)
            pl.BlockSpec((npad, d), lambda i: (0, 0)),
            pl.BlockSpec((_TILE, d), lambda i: (i, 0)),
        ],
        # one whole-array output block; each grid step writes its row
        out_specs=pl.BlockSpec((npad // _TILE, _TILE), lambda i: (0, 0)),
        out_shape=jax.ShapeDtypeStruct((npad // _TILE, _TILE),
                                       jnp.float32),
        interpret=interpret,
    )(pts, pts)
    return jnp.sqrt(jnp.maximum(out.ravel()[:n], 0.0))


def pairwise_min_dist_reference(points, p=2):
    """Fused jnp fallback: leave-one-out NN distances (p=2 or inf)."""
    points = jnp.asarray(points)
    n = points.shape[0]
    delta = points[:, None, :] - points[None, :, :]
    if p == 2:
        dist = jnp.sqrt(jnp.sum(delta * delta, axis=-1))
    else:
        dist = jnp.max(jnp.abs(delta), axis=-1)
    dist = dist + jnp.where(jnp.eye(n, dtype=bool), jnp.inf, 0.0)
    return jnp.min(dist, axis=1)


@functools.partial(jax.jit, static_argnames=("p", "use_pallas",
                                             "interpret"))
def pairwise_min_dist(points, p=2, use_pallas=True, interpret=False):
    """Leave-one-out nearest-neighbor distances of ``points`` (N, d).

    ``p=2`` (balls) uses the MXU-tiled Pallas kernel on TPU;
    ``p=inf`` (cubes) and non-TPU backends use the fused jnp fallback.
    """
    points = jnp.asarray(points, jnp.float32)
    on_tpu = jax.devices()[0].platform == "tpu"
    if (_HAS_PALLAS and use_pallas and p == 2
            and (on_tpu or interpret)):
        return _pairwise_min_l2_pallas(points, interpret=interpret)
    return pairwise_min_dist_reference(points, p=p)
