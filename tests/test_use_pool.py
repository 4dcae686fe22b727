"""Pool semantics: worker distinctness (PID-carrying blobs, reference
``tests/test_pool.py:51-245`` / ``tests/test_resume.py:17-22``) and the
per-site ``use_pool`` flags."""

import os

import numpy as np
import pytest

import dynesty_tpu as dytpu
from dynesty_tpu.pool import Pool

from utils import get_rstate

NDIM = 2
LNORM = -0.5 * np.log(2 * np.pi) * NDIM


def loglike_pid(x):
    """Gaussian logl whose blob records the evaluating process."""
    return (-0.5 * np.dot(x, x) + LNORM,
            np.float64(os.getpid()))


def loglike_plain(x):
    return -0.5 * np.dot(x, x) + LNORM


def ptform(u):
    return 10.0 * (2.0 * u - 1.0)


def test_pool_pid_distinct():
    """Evaluations must really run in distinct worker processes (default
    tier, matching the reference CI: ``tests/test_resume.py:17-22``)."""
    rstate = get_rstate()
    with Pool(2, loglike_pid, ptform) as pool:
        samp = dytpu.NestedSampler(pool.loglike, pool.prior_transform,
                                   NDIM, nlive=60, bound="single",
                                   sample="unif", rstate=rstate,
                                   likelihood_mode="host", pool=pool,
                                   blob=True, queue_size=16)
        samp.run_nested(print_progress=False, maxiter=200, add_live=False)
    res = samp.results
    pids = np.unique(np.asarray(res.blob, dtype=np.int64))
    assert len(pids) >= 2, pids
    assert os.getpid() not in pids  # none evaluated in the parent


def test_bootstrap_update_bound_in_pool():
    """The update_bound bootstrap realizations must actually dispatch to
    worker processes when enabled (PID telemetry on the bound), and stay
    in the parent when the flag is off."""
    first = {"min_ncall": 80, "min_eff": 100.0}  # force an early refit
    rstate = get_rstate()
    with Pool(2, loglike_plain, ptform) as pool:
        samp = dytpu.NestedSampler(pool.loglike, pool.prior_transform,
                                   NDIM, nlive=60, bound="single",
                                   sample="unif", rstate=rstate,
                                   likelihood_mode="host", pool=pool,
                                   bootstrap=3, queue_size=16,
                                   first_update=first)
        samp.run_nested(print_progress=False, maxiter=150, add_live=False)
        pids = getattr(samp.bound, "last_bootstrap_pids", None)
        assert pids, "bootstrap expansion never ran"
        assert all(p != os.getpid() for p in pids), pids

    rstate = get_rstate()
    with Pool(2, loglike_plain, ptform) as pool:
        samp = dytpu.NestedSampler(pool.loglike, pool.prior_transform,
                                   NDIM, nlive=60, bound="single",
                                   sample="unif", rstate=rstate,
                                   likelihood_mode="host", pool=pool,
                                   use_pool={"update_bound": False},
                                   bootstrap=3, queue_size=16,
                                   first_update=first)
        samp.run_nested(print_progress=False, maxiter=150, add_live=False)
        pids = getattr(samp.bound, "last_bootstrap_pids", None)
        assert pids, "bootstrap expansion never ran"
        assert all(p == os.getpid() for p in pids), pids


@pytest.mark.slow
@pytest.mark.parametrize("flag", ["prior_transform", "loglikelihood",
                                  "propose_point", "update_bound",
                                  "stop_function"])
def test_use_pool_flag_toggles(flag):
    """Each use_pool flag, individually disabled, still runs end to end
    (reference ``tests/test_pool.py`` per-flag toggles)."""
    rstate = get_rstate()
    use_pool = {flag: False}
    with Pool(2, loglike_plain, ptform) as pool:
        samp = dytpu.NestedSampler(pool.loglike, pool.prior_transform,
                                   NDIM, nlive=60, bound="single",
                                   sample="unif", rstate=rstate,
                                   likelihood_mode="host", pool=pool,
                                   use_pool=use_pool, queue_size=16,
                                   bootstrap=3)
        samp.run_nested(print_progress=False, maxiter=150, add_live=False)
    assert samp.it > 1


def test_use_pool_unknown_key():
    rstate = get_rstate()
    with pytest.raises(ValueError, match="use_pool"):
        dytpu.NestedSampler(loglike_plain, ptform, NDIM, nlive=60,
                            rstate=rstate, likelihood_mode="host",
                            use_pool={"bogus_site": True})


def test_use_pool_accepted_without_pool():
    # flags without a pool are a no-op, not an error
    rstate = get_rstate()
    samp = dytpu.NestedSampler(loglike_plain, ptform, NDIM, nlive=60,
                               bound="single", sample="unif",
                               rstate=rstate, likelihood_mode="host",
                               use_pool={"loglikelihood": True},
                               queue_size=16)
    samp.run_nested(print_progress=False, maxiter=100, add_live=False)
    assert samp.it > 1


def test_n_mc_stopping_over_pool():
    """The dynamic driver's n_mc KL stopping realizations map over the
    pool when use_pool['stop_function'] (reference
    ``dynamicsampler.py:738-743``)."""
    import jax.numpy as jnp

    def jax_loglike(x):
        return -0.5 * jnp.dot(x, x) + LNORM

    rstate = get_rstate()
    with Pool(2, loglike_plain, ptform) as pool:
        dns = dytpu.DynamicNestedSampler(jax_loglike, ptform, NDIM,
                                         bound="single", sample="unif",
                                         rstate=rstate, pool=pool,
                                         queue_size=32)
        dns.run_nested(nlive_init=80, nlive_batch=40, maxbatch=2,
                       print_progress=False, use_stop=True,
                       n_effective=2000,
                       stop_kwargs={"n_mc": 10, "error": "jitter"})
    res = dns.results
    assert np.isfinite(res.logz[-1])
    # the pooled stop check ran at least once and allowed batches
    assert dns.batch >= 1
