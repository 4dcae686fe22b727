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


def test_namespace_parity():
    """Reference users import these names exactly as spelled here
    (reference ``dynesty/__init__.py``, ``utils.py:24-52,376``,
    ``results.py``, ``internal_samplers.py:33``, ``pool.py:20``)."""
    from dynesty_tpu.results import Results, print_fn  # noqa: F401
    from dynesty_tpu.internal_samplers import (  # noqa: F401
        INTERNAL_SAMPLER_LIST, InternalSampler, UnitCubeSampler,
        UniformBoundSampler, RWalkSampler, SliceSampler, RSliceSampler)
    from dynesty_tpu.pool import initializer  # noqa: F401
    from dynesty_tpu.utils import (  # noqa: F401
        SQRTEPS, SamplerHistoryItem, IteratorResult, IteratorResultShort,
        PrintFnArgs, get_print_fn_args, print_fn_fallback, print_fn_tqdm)
    assert INTERNAL_SAMPLER_LIST == ["rwalk", "unif", "rslice", "slice"]
    assert 0 < SQRTEPS < 1e-7
    assert dytpu.results is not None and dytpu.dynamicsampler is not None


def test_print_fn_tiers():
    """get_print_fn_args builds the three width tiers; the dynamic-batch
    form reports the stop value instead of dlogz (reference
    ``utils.py:575-651``)."""
    from dynesty_tpu.utils import IteratorResultShort, get_print_fn_args

    it = IteratorResultShort(worst=0, ustar=None, vstar=None,
                             loglstar=-1.0, nc=3, worst_it=1, boundidx=0,
                             bounditer=2, eff=12.5, delta_logz=4.0,
                             proposal_stats=None)
    base = get_print_fn_args(it, 10, 100, dlogz=0.1)
    assert base.niter == 10
    assert any(s.startswith("dlogz:") for s in base.long_str)
    assert len(" | ".join(base.long_str)) > len("|".join(base.short_str))
    batch = get_print_fn_args(it, 10, 100, dlogz=0.1, stop_val=1.5,
                              nbatch=2, logl_min=-3.0, logl_max=2.0)
    assert any(s.startswith("stop:") for s in batch.long_str)
    assert any(s.startswith("stop:") for s in batch.mid_str)
    assert any("<" in s for s in batch.short_str)


def test_print_fn_fallback_writes(capsys):
    from dynesty_tpu.utils import IteratorResultShort, print_fn_fallback

    it = IteratorResultShort(worst=0, ustar=None, vstar=None,
                             loglstar=-1.0, nc=3, worst_it=1, boundidx=0,
                             bounditer=2, eff=12.5, delta_logz=4.0,
                             proposal_stats=None)
    print_fn_fallback(it, 42, 420, dlogz=0.1)
    err = capsys.readouterr().err
    assert "42" in err and "eff(%)" in err
