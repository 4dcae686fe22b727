"""Concentric-shell plateau suite (reference ``tests/test_plateau.py:11-120``).

The ``Plateau`` likelihood is piecewise constant over concentric spheres
— the sharpest test of the plateau bookkeeping (uniform dead-point
spacing within a level, exact analytic logz): static runs across
samplers and dlogz targets, a dynamic run, and a merge of repeated runs.
"""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import gammaln, logsumexp

import dynesty_tpu as dytpu
from dynesty_tpu.utils import merge_runs

from utils import get_rstate


class Plateau:
    """Piecewise-constant likelihood over concentric spheres: value
    ``as_[k]`` between radii ``rs[k]`` and ``rs[k+1]``, ``as_[-1]``
    outside the last sphere, on the box ``-s < x < s`` (reference
    ``tests/test_plateau.py:11-50``)."""

    def __init__(self, ndim, rs=(1.0,), as_=(10.0, 1.0), s=3.0):
        assert len(rs) + 1 == len(as_)
        assert rs[-1] < s
        self.ndim = ndim
        self.s = s
        self.rs = np.concatenate([[0.0], np.asarray(rs, dtype=float)])
        self.log_as = np.log(np.asarray(as_, dtype=float))
        self._rs_j = jnp.asarray(self.rs)
        self._log_as_j = jnp.asarray(self.log_as)

    def loglike(self, x):
        r = jnp.sqrt(jnp.sum(x ** 2))
        xid = jnp.searchsorted(self._rs_j, r, side="right")
        return self._log_as_j[xid - 1]

    def ptform(self, u):
        return (2.0 * u - 1.0) * self.s

    @property
    def logz_true(self):
        n = self.ndim
        logmult = n / 2.0 * np.log(np.pi) - gammaln(n / 2.0 + 1)
        logvols = np.zeros(len(self.rs))
        logvols[:-1] = logmult + n * np.log(self.rs[1:]) + \
            np.log1p(-(self.rs[:-1] / self.rs[1:]) ** n)
        logvols[-1] = n * np.log(2 * self.s) + np.log1p(
            -np.exp(logmult + n * np.log(self.rs[-1] / (2 * self.s))))
        logprior = -n * np.log(2 * self.s)
        return logsumexp(self.log_as + logvols) + logprior


@pytest.mark.parametrize("sample,dlogz", [("unif", 1), ("rwalk", 1),
                                          ("rslice", 1), ("unif", .01),
                                          ("rwalk", .01), ("rslice", .01)])
def test_static(sample, dlogz):
    # nlive trimmed for the MCMC kernels (CPU test tier); the 3-sigma
    # gate is nlive-independent
    nlive = 1000 if sample == "unif" else 400
    rstate = get_rstate()
    plateau = Plateau(2)
    sampler = dytpu.NestedSampler(plateau.loglike, plateau.ptform,
                                  plateau.ndim, nlive=nlive,
                                  rstate=rstate, bound="none",
                                  sample=sample, queue_size=64)
    sampler.run_nested(print_progress=False, dlogz=dlogz)
    res = sampler.results
    assert np.abs(res.logz[-1] - plateau.logz_true) < 3 * res.logzerr[-1], \
        (res.logz[-1], plateau.logz_true, res.logzerr[-1])


@pytest.mark.parametrize("sample", ["unif", "rslice", "rwalk"])
def test_dynamic(sample):
    rstate = get_rstate()
    plateau = Plateau(2)
    sampler = dytpu.DynamicNestedSampler(plateau.loglike, plateau.ptform,
                                         plateau.ndim, nlive=100,
                                         rstate=rstate, bound="none",
                                         sample=sample, queue_size=32)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert np.abs(res.logz[-1] - plateau.logz_true) < 3 * res.logzerr[-1], \
        (res.logz[-1], plateau.logz_true, res.logzerr[-1])


def test_merge():
    rstate = get_rstate()
    plateau = Plateau(2)
    res_list = []
    for _ in range(3):
        sampler = dytpu.NestedSampler(plateau.loglike, plateau.ptform,
                                      plateau.ndim, nlive=100,
                                      rstate=rstate, bound="none",
                                      sample="unif", queue_size=32)
        sampler.run_nested(print_progress=False)
        res_list.append(sampler.results)
    res = merge_runs(res_list)
    assert np.abs(res.logz[-1] - plateau.logz_true) < 3 * res.logzerr[-1], \
        (res.logz[-1], plateau.logz_true, res.logzerr[-1])
