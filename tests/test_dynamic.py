"""Dynamic sampler end-to-end tests (pattern of reference
``tests/test_dyn.py`` and the dynamic parts of ``test_gau.py``)."""

import numpy as np
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu
from dynesty_tpu.dynamicsampler import weight_function, stopping_function

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


def test_dynamic_gaussian():
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM, bound="multi",
                                     sample="unif", rstate=rstate,
                                     queue_size=64)
    dns.run_nested(nlive_init=200, nlive_batch=100, maxbatch=4,
                   print_progress=False)
    res = dns.results
    assert res.isdynamic()
    assert abs(res.logz[-1] - LOGZ_TRUTH) < 5 * res.logzerr[-1]
    assert dns.batch >= 1
    assert len(res.batch_nlive) == dns.batch + 1
    # per-sample live point counts vary across batches
    assert np.ptp(res.samples_n) > 0


def test_neff_stopping():
    # with a tiny ESS target the run should stop early via the default
    # stopping function
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM, bound="single",
                                     sample="unif", rstate=rstate,
                                     queue_size=64)
    dns.run_nested(nlive_init=150, nlive_batch=100, n_effective=500,
                   print_progress=False)
    assert dns.n_effective >= 500
    res = dns.results
    assert abs(res.logz[-1] - LOGZ_TRUTH) < 5 * res.logzerr[-1]


@pytest.mark.parametrize("mode", ["weight", "full", "manual", "auto"])
def test_add_batch_modes(mode):
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM, bound="single",
                                     sample="unif", rstate=rstate,
                                     queue_size=64)
    dns.run_nested(nlive_init=150, maxbatch=0, print_progress=False)
    n0 = dns.results.niter
    kwargs = {}
    if mode == "manual":
        kwargs["logl_bounds"] = (-10.0, np.inf)
    if mode == "full":
        kwargs["mode"] = "manual"
        kwargs["logl_bounds"] = (-np.inf, np.inf)
    else:
        kwargs["mode"] = mode
    dns.add_batch(nlive=100, print_progress=False, **kwargs)
    res = dns.results
    assert res.niter > n0
    assert abs(res.logz[-1] - LOGZ_TRUTH) < 5 * res.logzerr[-1]


def test_weight_function_bounds():
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM, bound="single",
                                     sample="unif", rstate=rstate,
                                     queue_size=64)
    dns.run_nested(nlive_init=150, maxbatch=0, print_progress=False)
    res = dns.results
    (lmin, lmax), (pwt, zwt, wt) = weight_function(res, {"pfrac": 0.8},
                                                   return_weights=True)
    assert lmin < lmax
    assert abs(pwt.sum() - 1) < 1e-8
    assert abs(zwt.sum() - 1) < 1e-8
    # evidence-only weights should push the bracket lower
    (lmin_z, _) = weight_function(res, {"pfrac": 0.0})
    assert lmin_z <= lmin or lmin_z == -np.inf


def test_stopping_function_vals():
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM, bound="single",
                                     sample="unif", rstate=rstate,
                                     queue_size=64)
    dns.run_nested(nlive_init=150, maxbatch=0, print_progress=False)
    res = dns.results
    stop, (sp, se, s) = stopping_function(
        res, {"target_n_effective": 10}, rstate=rstate, return_vals=True)
    assert stop  # tiny target already satisfied
    stop2 = stopping_function(res, {"target_n_effective": 10**8},
                              rstate=rstate)
    assert not stop2
    # MC-realization path
    stop3, vals = stopping_function(
        res, {"target_n_effective": 10, "n_mc": 25, "error": "jitter"},
        rstate=rstate, return_vals=True)
    assert np.isfinite(vals[2])


def test_dynamic_eggbox():
    # multimodal dynamic run (reference tests/test_dyn.py:27-42)
    tmax = 5.0 * np.pi

    def loglike(x):
        t = 2.0 * tmax * x - tmax
        return (2.0 + jnp.cos(t[0] / 2.0) * jnp.cos(t[1] / 2.0)) ** 5.0

    def ptform(u):
        return u

    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, 2, bound="multi",
                                     sample="unif", rstate=rstate,
                                     queue_size=128)
    dns.run_nested(nlive_init=300, nlive_batch=100, maxbatch=2,
                   print_progress=False, dlogz_init=0.01)
    res = dns.results
    assert abs(res.logz[-1] - 235.856) < 5 * res.logzerr[-1], \
        (res.logz[-1], res.logzerr[-1])
