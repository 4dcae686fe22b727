"""Miscellaneous regression tests (patterns of reference
``tests/test_misc.py``): batch edge cases, update_interval semantics,
exception propagation, first_update, results conversions."""

import numpy as np
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu

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


def test_maxiter_mid_batch():
    # interrupting a batch via maxiter must not corrupt the combined run
    # (reference issue #392, test_misc.py:474-509)
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                     bound="single", sample="unif",
                                     rstate=rstate, queue_size=32)
    dns.run_nested(nlive_init=120, maxbatch=0, print_progress=False)
    niter0 = dns.results.niter
    dns.add_batch(nlive=80, maxiter=50, print_progress=False)
    res = dns.results
    assert res.niter > niter0
    assert np.isfinite(res.logz[-1])
    assert np.all(np.diff(res.logl) >= 0)


def test_batch_cost_stability():
    # repeated 'full' batches should cost comparably (reference #415,
    # test_misc.py:511-536)
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                     bound="single", sample="unif",
                                     rstate=rstate, queue_size=64)
    dns.run_nested(nlive_init=150, maxbatch=0, print_progress=False)
    costs = []
    for _ in range(5):
        nc0 = dns.ncall
        dns.add_batch(nlive=100, mode="manual",
                      logl_bounds=(-np.inf, np.inf),
                      print_progress=False)
        costs.append(dns.ncall - nc0)
    assert max(costs) / min(costs) < 3, costs


def test_nlive_mismatch_batches():
    # batches with nlive different from the baseline merge correctly
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                     bound="single", sample="unif",
                                     rstate=rstate, queue_size=32)
    dns.run_nested(nlive_init=200, maxbatch=0, print_progress=False)
    dns.add_batch(nlive=37, print_progress=False)
    dns.add_batch(nlive=151, print_progress=False)
    res = dns.results
    assert abs(res.logz[-1] - LOGZ_TRUTH) < 5 * res.logzerr[-1]
    assert np.all(np.diff(res.logl) >= 0)
    assert set(np.unique(res.samples_batch)) == {0, 1, 2}


def test_first_update():
    # forcing a very early first update switches off cube sampling fast
    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(
        loglike, ptform, NDIM, nlive=120, bound="single", sample="unif",
        first_update={"min_ncall": 10, "min_eff": 100.0},
        rstate=rstate, queue_size=32)
    sampler.run_nested(maxiter=300, print_progress=False)
    assert not sampler.unit_cube_sampling
    assert sampler.nbound > 1

    with pytest.raises(ValueError):
        dytpu.NestedSampler(loglike, ptform, NDIM,
                            first_update={"bogus_key": 1})


def test_update_interval_semantics():
    # small update_interval => more bound refits
    loglike, ptform = _gau()
    nbounds = []
    for interval in (0.2, 10.0):
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=150,
                                      bound="single", sample="unif",
                                      update_interval=interval,
                                      rstate=rstate, queue_size=32)
        sampler.run_nested(print_progress=False)
        nbounds.append(sampler.nbound)
    assert nbounds[0] > nbounds[1]


def test_exception_propagation():
    # user exceptions inside the (host-mode) likelihood surface cleanly
    def bad_logl(x):
        raise RuntimeError("user kaboom")

    def ptform(u):
        return u

    with pytest.raises(RuntimeError, match="user kaboom"):
        dytpu.NestedSampler(bad_logl, ptform, 2, nlive=50,
                            likelihood_mode="host")


def test_ncdim_slice_ban():
    loglike, ptform = _gau()
    with pytest.raises(ValueError):
        dytpu.NestedSampler(loglike, ptform, NDIM, ncdim=2,
                            sample="rslice")


def test_check_result_static():
    from dynesty_tpu.utils import check_result_static

    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                     bound="single", sample="unif",
                                     rstate=rstate, queue_size=32)
    dns.run_nested(nlive_init=120, maxbatch=0, print_progress=False)
    res = check_result_static(dns.results)
    # baseline-only dynamic run has a constant nlive profile
    assert not res.isdynamic()
    assert res["nlive"] == 120


def test_unused_reference_kwargs_accepted():
    # use_pool and pool are part of the reference API surface
    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(
        loglike, ptform, NDIM, nlive=100, bound="single", sample="unif",
        use_pool={"loglikelihood": True}, pool=None, rstate=rstate,
        queue_size=32)
    sampler.run_nested(maxiter=100, print_progress=False)
    assert np.isfinite(sampler.results.logz[-1])


def test_reset():
    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=32)
    sampler.run_nested(maxiter=200, print_progress=False, add_live=False)
    sampler.reset()
    assert sampler.it == 1
    assert len(sampler.saved_run) == 0
    sampler.run_nested(maxiter=200, print_progress=False, add_live=False)
    assert np.isfinite(sampler.saved_run["logz"][-1])


def test_no_global_numpy_random():
    # RNG discipline (the reference enforces this with a CI grep):
    # no np.random.<fn> calls on the legacy global state in the library
    import pathlib
    import re

    root = pathlib.Path(dytpu.__file__).parent
    bad = []
    pat = re.compile(r"np\.random\.(?!Generator|PCG64|default_rng)")
    for f in root.rglob("*.py"):
        for i, line in enumerate(f.read_text().splitlines()):
            if pat.search(line):
                bad.append(f"{f}:{i + 1}: {line.strip()}")
    assert not bad, bad


def test_proposal_stats_plumbing():
    # per-sample proposal statistics reach Results (reference
    # test_proposal_stats.py pattern)
    loglike, ptform = _gau()
    for sample, keys in (("rwalk", {"n_accept", "n_reject"}),
                         ("rslice", {"n_expand", "n_contract"}),
                         ("unif", {"n_proposals"})):
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=120,
                                      bound="single", sample=sample,
                                      rstate=rstate, queue_size=32)
        sampler.run_nested(print_progress=False, add_live=False)
        stats = sampler.results.proposal_stats
        filled = [s for s in stats if s is not None]
        assert len(filled) > 0
        assert set(filled[-1].keys()) == keys, (sample, filled[-1])


def test_bound_versions_globally_unique():
    # Regression: internal-sampler instances (and their device bound-array
    # caches, keyed on bound_version) are shared across the dynamic
    # layer's batch samplers.  Per-instance version counters collided and
    # served batch N the bound uploaded for batch N-1, truncating its
    # seed distribution and biasing merged logz by ~+0.1 per batch.
    loglike, ptform = _gau()
    seen = set()
    for _ in range(3):
        rstate = get_rstate()
        s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=60,
                                bound="single", sample="unif",
                                rstate=rstate, queue_size=16)
        s.run_nested(maxiter=80, print_progress=False, add_live=False)
        assert s.bound_version not in seen
        seen.add(s.bound_version)


def test_exception_context(capsys):
    """User-function exceptions are re-raised with the offending point
    printed (reference ``dynesty.py:794-810``,
    ``tests/test_misc.py:239-249``)."""
    import pytest

    def bad_loglike(x):
        raise RuntimeError("user function blew up")

    def ptform(u):
        return 2.0 * u - 1.0

    rstate = get_rstate()
    with pytest.raises(RuntimeError, match="user function blew up"):
        dytpu.NestedSampler(bad_loglike, ptform, 2, nlive=20,
                            rstate=rstate, likelihood_mode="host")
    err = capsys.readouterr().err
    assert "Exception while calling loglikelihood function" in err
    assert "params:" in err


def test_round_chaining_policy():
    """Dispatch-chaining policy: by default uniform kernels chain at most
    unif_max_chain device-refit rounds (ellipsoid bounds; 1 otherwise),
    MCMC kernels follow rounds_per_dispatch, the factories default to
    auto (None -> 8), and an EXPLICIT rounds_per_dispatch lifts the unif
    ellipsoid cap (expensive-likelihood regime)."""
    import inspect

    from dynesty_tpu.internal.samplers import (RSliceSampler, RWalkSampler,
                                               SliceSampler,
                                               UniformBoundSampler,
                                               UnitCubeSampler)

    assert UniformBoundSampler.max_rounds_per_dispatch == 1
    assert UniformBoundSampler.unif_max_chain == 8
    # unit-cube rounds chain up to 8, guarded by the device-side
    # first-update chain-stop gate (UnitCubeSampler.device_chain_stop_fn)
    assert UnitCubeSampler.max_rounds_per_dispatch == 8
    assert UnitCubeSampler(ndim=2).device_chain_stop_fn() is not None
    assert RWalkSampler.max_rounds_per_dispatch is None
    assert SliceSampler.max_rounds_per_dispatch is None
    assert RSliceSampler.max_rounds_per_dispatch is None
    sig = inspect.signature(dytpu.NestedSampler.__init__)
    assert sig.parameters["rounds_per_dispatch"].default is None
    sig = inspect.signature(dytpu.DynamicNestedSampler)
    assert sig.parameters["rounds_per_dispatch"].default is None

    class _NS:
        pass

    us = UniformBoundSampler(ndim=2)
    ns = _NS()
    ns.rounds_explicit = False
    assert us._max_rounds(ns, "ellipsoids") == 8
    assert us._max_rounds(ns, "balls") == 1
    ns.unif_chain_cap = 16  # the dynamic batch configurator's override
    assert us._max_rounds(ns, "ellipsoids") == 16
    del ns.unif_chain_cap
    ns.rounds_explicit = True
    assert us._max_rounds(ns, "ellipsoids") is None
    assert us._max_rounds(ns, "balls") == 1

    # auto default resolves to 8 with rounds_explicit unset
    loglike, ptform = _gau()
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=50,
                            rstate=get_rstate())
    assert s.rounds_per_dispatch == 8 and not s.rounds_explicit
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=50,
                            rstate=get_rstate(), rounds_per_dispatch=12)
    assert s.rounds_per_dispatch == 12 and s.rounds_explicit


def test_dtype_kwarg():
    """``dtype=`` forces the device-kernel precision through both
    factories (the integrator is always host float64)."""
    import jax.numpy as jnp

    loglike, ptform = _gau()
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=50,
                            rstate=get_rstate(), dtype=jnp.float32)
    assert s.dtype == jnp.float32
    s.run_nested(maxiter=120, print_progress=False)
    assert np.isfinite(s.results.logz[-1])

    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                     rstate=get_rstate(),
                                     dtype=jnp.float32)
    dns.run_nested(nlive_init=50, maxbatch=1, print_progress=False)
    assert dns.sampler.dtype == jnp.float32
    assert np.isfinite(dns.results.logz[-1])


def test_timings_populated():
    # every run populates the wall-clock attribution dict (perf
    # telemetry; printed by bench.py) on both sampler layers
    loglike, ptform = _gau()
    rstate = get_rstate()
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                            bound="single", sample="unif",
                            rstate=rstate, queue_size=32)
    s.run_nested(print_progress=False)
    t = s.timings
    for key in ("dispatch", "consume", "total", "n_dispatch",
                "nc_launched"):
        assert key in t, key
    assert t["n_dispatch"] >= 1
    assert t["dispatch"] > 0
    assert t["total"] >= t["dispatch"]
    assert t["nc_launched"] >= s.ncall - 100  # init draws not dispatched

    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                     bound="single", sample="unif",
                                     rstate=get_rstate(), queue_size=32)
    dns.run_nested(nlive_init=100, maxbatch=1, nlive_batch=50,
                   print_progress=False)
    dt = dns.timings
    assert dt["n_dispatch"] >= 2  # base run + at least one batch
    assert dt["dispatch"] > 0


def test_pipelining_engages():
    """Regression gate for ``_pipeline_capable``: an ellipsoid-bound
    run with a traceable likelihood MUST actually pre-launch dispatches
    (duty-cycle telemetry; a silent capability regression would
    otherwise only show up as a bench slowdown), and a natural
    (dlogz-terminated) stop must not strand pre-launched work."""
    loglike, ptform = _gau()
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=200,
                            bound="single", sample="unif",
                            rstate=get_rstate(), queue_size=32)
    s.run_nested(print_progress=False)
    t = s.timings
    assert t.get("n_prelaunch", 0) >= 1, \
        f"pipelined pre-launches never engaged: {dict(t)}"
    # the run above terminated on dlogz: every pre-launched dispatch
    # must have been consumed, not billed as stranded speculative work
    assert t.get("nc_stranded_pipeline", 0) == 0
