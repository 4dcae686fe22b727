"""Tests of the run algebra: jitter/resample realizations, merging,
unraveling, reweighting, KL errors (reference ``test_gau.py:144-158,
295-316`` patterns)."""

import numpy as np
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu
from dynesty_tpu.utils import (jitter_run, resample_run, reweight_run,
                               unravel_run, merge_runs, kld_error)

from utils import get_rstate

NDIM = 3
LOGZ_TRUTH = NDIM * (-np.log(20.0))


@pytest.fixture(scope="module")
def gau_run():
    cov = np.identity(NDIM)
    cov[cov == 0] = 0.95
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * NDIM +
                    np.log(np.linalg.det(cov)))

    def loglike(x):
        return -0.5 * jnp.dot(x, jnp.asarray(cinv) @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=150,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=64)
    sampler.run_nested(print_progress=False)
    return sampler.results


def test_jitter(gau_run):
    rstate = get_rstate()
    logzs = [jitter_run(gau_run, rstate=rstate)["logz"][-1]
             for _ in range(20)]
    spread = np.std(logzs)
    # jitter spread should be comparable to the reported logzerr
    assert 0.2 * gau_run.logzerr[-1] < spread < 5 * gau_run.logzerr[-1]
    assert abs(np.mean(logzs) - LOGZ_TRUTH) < 5 * gau_run.logzerr[-1]
    # approx mode works too
    jr = jitter_run(gau_run, rstate=rstate, approx=True)
    assert np.isfinite(jr["logz"][-1])


def test_resample(gau_run):
    rstate = get_rstate()
    logzs = [resample_run(gau_run, rstate=rstate)["logz"][-1]
             for _ in range(20)]
    assert abs(np.mean(logzs) - LOGZ_TRUTH) < 5 * gau_run.logzerr[-1]
    new, idx = resample_run(gau_run, rstate=rstate, return_idx=True)
    assert len(idx) == new["niter"] if not new.isdynamic() else True
    # logl must be sorted
    assert np.all(np.diff(new["logl"]) >= 0)


def test_thread_count_identity(gau_run):
    """The recorded sawtooth ``samples_n`` must be exactly reconstructible
    from the per-sample (birth, death) thread intervals — the invariant
    the thread-based error analysis (resample/unravel) rests on."""
    from dynesty_tpu.utils.runs import _thread_counts

    logl = np.asarray(gau_run["logl"])
    birth = np.asarray(gau_run["samples_birth"])
    assert np.all(birth < logl)
    assert np.sum(np.isneginf(birth)) >= gau_run.nlive
    n_rec = _thread_counts(logl, birth)
    assert np.array_equal(n_rec, np.asarray(gau_run["samples_n"]))


def test_kld(gau_run):
    rstate = get_rstate()
    kld = kld_error(gau_run, error="jitter", rstate=rstate)
    assert np.isfinite(kld[-1])
    kld2, new = kld_error(gau_run, error="resample", rstate=rstate,
                          return_new=True)
    assert np.isfinite(kld2[-1])


def test_reweight(gau_run):
    # reweighting to the same distribution is a no-op on logz
    same = reweight_run(gau_run, logp_new=np.asarray(gau_run["logl"]))
    assert abs(same["logz"][-1] - gau_run.logz[-1]) < 1e-9
    # slightly hotter target shifts logz predictably
    hotter = reweight_run(gau_run,
                          logp_new=1.05 * np.asarray(gau_run["logl"]))
    assert hotter["logz"][-1] != gau_run.logz[-1]


def test_unravel_merge_roundtrip(gau_run):
    strands = unravel_run(gau_run)
    # batch-mode runs unravel into birth cohorts: the prior-born run
    # plus one lower-bounded cohort per proposal round
    n_cohorts = len(np.unique(np.asarray(gau_run["samples_birth"])))
    assert len(strands) == n_cohorts
    assert sum(s["niter"] for s in strands) == len(gau_run.logl)
    merged = merge_runs(strands, print_progress=False)
    # the merged run must reproduce the original evidence within errors
    assert abs(merged["logz"][-1] - gau_run.logz[-1]) < \
        5 * gau_run.logzerr[-1]


def test_merge_independent_runs():
    cov = np.identity(NDIM)
    cov[cov == 0] = 0.95
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * NDIM +
                    np.log(np.linalg.det(cov)))

    def loglike(x):
        return -0.5 * jnp.dot(x, jnp.asarray(cinv) @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    runs = []
    for seed in (1, 2, 3):
        rstate = get_rstate(seed)
        s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                bound="single", sample="unif",
                                rstate=rstate, queue_size=32)
        s.run_nested(print_progress=False)
        runs.append(s.results)
    merged = merge_runs(runs, print_progress=False)
    # merged run behaves like a ~300 live point run: tighter error
    assert merged["logzerr"][-1] < min(r.logzerr[-1] for r in runs)
    assert abs(merged["logz"][-1] - LOGZ_TRUTH) < 4 * merged["logzerr"][-1]
