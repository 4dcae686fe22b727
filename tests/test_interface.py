"""Extension-interface tests: user-defined Bound subclasses, the pool
shim, printing (patterns of reference ``test_bound_interface.py``,
``test_sampler_interface.py``, ``test_pool.py``, ``test_printing.py``)."""

import io
import sys

import numpy as np
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu
import dynesty_tpu.bounding as db

from utils import get_rstate

NDIM = 3
LOGZ_TRUTH = NDIM * (-np.log(20.0))


def _gau():
    cov = np.identity(NDIM)
    cov[cov == 0] = 0.95
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * NDIM +
                    np.log(np.linalg.det(cov)))

    def loglike(x):
        return -0.5 * jnp.dot(x, jnp.asarray(cinv) @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    return loglike, ptform


class Box(db.Bound):
    """User-defined bound: an axis-aligned box around the live points
    (the reference's test Bound, ``test_bound_interface.py:20-52``)."""

    def __init__(self, ndim):
        super().__init__(ndim)
        self.cen = np.zeros(ndim) + 0.5
        self.size = 0.5

    def contains(self, x):
        return bool((np.abs(x - self.cen) < self.size).all())

    def sample(self, rstate=None):
        return rstate.uniform(np.maximum(self.cen - self.size, 0),
                              np.minimum(self.cen + self.size, 1))

    def samples(self, nsamples, rstate=None):
        lo = np.maximum(self.cen - self.size, 0)
        hi = np.minimum(self.cen + self.size, 1)
        return rstate.uniform(lo, hi, size=(nsamples, self.ndim))

    def get_random_axes(self, rstate):
        return np.eye(self.ndim) * self.size

    def scale_to_logvol(self, logvol):
        self.size = np.exp(logvol / self.ndim)

    def update(self, points, rstate=None, bootstrap=0, pool=None):
        self.cen = points.mean(axis=0)
        self.size = np.abs(points - self.cen).max() * 2
        self.logvol = np.log(self.size) * self.ndim


@pytest.mark.parametrize("sample", ["unif", "rwalk", "rslice"])
def test_custom_bound(sample):
    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=250,
                                  bound=Box(NDIM), sample=sample,
                                  rstate=rstate, queue_size=64)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert abs(res.logz[-1] - LOGZ_TRUTH) < 5 * res.logzerr[-1], \
        (res.logz[-1], LOGZ_TRUTH, res.logzerr[-1])


def test_bound_instances():
    # passing pre-built bound instances works like the string names
    loglike, ptform = _gau()
    for bound in (db.UnitCube(NDIM), db.Ellipsoid(NDIM),
                  db.MultiEllipsoid(NDIM)):
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=150,
                                      bound=bound, sample="rwalk",
                                      rstate=rstate, queue_size=32)
        sampler.run_nested(print_progress=False, maxiter=300)
        assert np.isfinite(sampler.results.logz[-1])


def test_walks_effect_on_ncall():
    # more walks => more likelihood calls (reference
    # test_sampler_interface.py:160-235 pattern)
    loglike, ptform = _gau()
    ncalls = []
    for walks in (5, 25):
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=150,
                                      bound="single", sample="rwalk",
                                      walks=walks, rstate=rstate,
                                      queue_size=32)
        sampler.run_nested(print_progress=False)
        ncalls.append(np.sum(sampler.results.ncall))
    assert ncalls[1] > ncalls[0]


def test_slices_effect_on_ncall():
    loglike, ptform = _gau()
    ncalls = []
    for slices in (1, 6):
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=150,
                                      bound="single", sample="rslice",
                                      slices=slices, rstate=rstate,
                                      queue_size=32)
        sampler.run_nested(print_progress=False)
        ncalls.append(np.sum(sampler.results.ncall))
    assert ncalls[1] > ncalls[0]


def _pool_loglike(x):
    return -0.5 * np.sum((x / 0.5) ** 2)


def _pool_ptform(u):
    return 2.0 * u - 1.0


def test_pool_shim():
    # dynesty.pool.Pool-compatible usage with host-mode likelihoods
    from dynesty_tpu.pool import Pool

    with Pool(2, _pool_loglike, _pool_ptform) as pool:
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(pool.loglike, pool.prior_transform,
                                      2, nlive=100, bound="single",
                                      sample="unif",
                                      likelihood_mode="host", pool=pool,
                                      rstate=rstate, queue_size=16)
        sampler.run_nested(print_progress=False, maxiter=200)
        assert np.isfinite(sampler.results.logz[-1])


def test_printing():
    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=32)
    stderr = io.StringIO()
    old = sys.stderr
    try:
        sys.stderr = stderr
        sampler.run_nested(print_progress=True, maxiter=100)
    finally:
        sys.stderr = old
    text = stderr.getvalue()
    assert "logz" in text or "it" in text


def test_custom_print_func():
    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=32)
    calls = []

    def my_print(results, niter, ncall, **kwargs):
        calls.append(niter)

    sampler.run_nested(print_progress=True, print_func=my_print,
                       maxiter=100)
    assert len(calls) > 0
