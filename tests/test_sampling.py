"""Distributional tests of the raw proposal kernels in isolation (no
nested sampling loop): chains targeting a uniform density inside a hard
constraint must produce uniform samples (pattern of reference
``tests/test_sampling.py:61-157``)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from scipy.stats import kstest

from dynesty_tpu.internal.likelihood import LogLikelihood
from dynesty_tpu.internal.kernels import (make_rwalk_round,
                                          make_slice_round)

from utils import get_rstate

Q = 512


def _diamond_like():
    # uniform inside |x-0.5| + |y-0.5| < 0.5, -inf outside
    def loglike(x):
        inside = jnp.abs(x[0] - 0.5) + jnp.abs(x[1] - 0.5) < 0.5
        return jnp.where(inside, 0.0, -jnp.inf)

    def ptform(u):
        return u

    return loglike, ptform


def _run_kernel(kind, nsteps=3):
    """Run the raw kernel round from uniform-in-diamond starts; chain the
    rounds a few times to decorrelate from the starts."""
    loglike, ptform = _diamond_like()
    like = LogLikelihood(loglike, ptform, 2)
    rstate = get_rstate()
    # rejection-sample Q valid starting points
    starts = []
    while len(starts) < Q:
        pts = rstate.random((4 * Q, 2))
        ok = np.abs(pts[:, 0] - 0.5) + np.abs(pts[:, 1] - 0.5) < 0.5
        starts.extend(pts[ok][:Q - len(starts)])
    u = np.array(starts)
    like.eval_host(u[:2])
    v = u.copy()
    logl = np.zeros(Q)
    axes = np.tile(np.eye(2) * 0.5, (Q, 1, 1))

    if kind == "rwalk":
        fn = make_rwalk_round(like, ndim=2, ncdim=2, q=Q, walks=20,
                              dtype=jnp.float64)
    else:
        fn = make_slice_round(like, ndim=2, q=Q, slices=3, kind=kind,
                              dtype=jnp.float64)

    loglstar = -0.5  # any value below 0 selects the whole diamond
    for i in range(nsteps):
        packed_in = np.concatenate(
            [u, v, logl[:, None], axes.reshape(Q, -1)], axis=1)
        key = jax.random.key(int(rstate.integers(2**63)))
        packed, _ = jax.device_get(
            fn(key, jnp.asarray(packed_in), None, 1.0, loglstar))
        u = np.asarray(packed[:, :2], dtype=np.float64)
        v = np.asarray(packed[:, 2:4], dtype=np.float64)
        logl = np.asarray(packed[:, 4], dtype=np.float64)
    return u


@pytest.mark.parametrize("kind", ["rwalk", "rslice", "slice"])
def test_kernel_uniformity(kind):
    u = _run_kernel(kind)
    # all samples stay inside the diamond
    assert np.all(np.abs(u[:, 0] - 0.5) + np.abs(u[:, 1] - 0.5) < 0.5)
    # rotate into the diamond frame: coordinates become iid uniform
    a = (u[:, 0] - 0.5) + (u[:, 1] - 0.5)  # in (-0.5, 0.5)
    b = (u[:, 0] - 0.5) - (u[:, 1] - 0.5)
    for coord in (a, b):
        stat = kstest(coord + 0.5, "uniform")
        assert stat.pvalue > 1e-4, (kind, stat)
    # independence-ish: correlation small
    assert abs(np.corrcoef(a, b)[0, 1]) < 0.15
