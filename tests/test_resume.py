"""Checkpoint/resume tests: save mid-run, restore, finish; the final
result must be bit-identical to an uninterrupted run (the invariant of
reference ``tests/test_resume.py:106-109``)."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp

import dynesty_tpu as dytpu

from utils import get_rstate

NDIM = 3
LOGZ_TRUTH = NDIM * (-np.log(20.0))


# module-level (picklable) problem definition
_COV = np.identity(NDIM)
_COV[_COV == 0] = 0.95
_CINV = np.linalg.inv(_COV)
_LNORM = -0.5 * (np.log(2 * np.pi) * NDIM + np.log(np.linalg.det(_COV)))


def gau_loglike(x):
    return -0.5 * jnp.dot(x, jnp.asarray(_CINV) @ x) + _LNORM


def gau_ptform(u):
    return 10.0 * (2.0 * u - 1.0)


def _gau():
    return gau_loglike, gau_ptform


def _run_static(maxiter_first=None, fname=None, proposal_mode="batch"):
    """Run a static fit, optionally stopping after ``maxiter_first``
    iterations, saving, restoring, and continuing."""
    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=120,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=32,
                                  proposal_mode=proposal_mode)
    if maxiter_first is None:
        sampler.run_nested(print_progress=False)
        return sampler.results
    sampler.run_nested(maxiter=maxiter_first, add_live=False,
                       print_progress=False)
    sampler.save(fname)
    del sampler, loglike, ptform

    # restore in a "fresh" context: user functions come back via pickle
    sampler2 = dytpu.NestedSampler.restore(fname)
    sampler2.run_nested(resume=True, print_progress=False)
    return sampler2.results


import pytest as _pytest  # noqa: E402


@_pytest.mark.parametrize("proposal_mode", ["batch", "queue"])
def test_static_save_restore_resume(proposal_mode):
    with tempfile.TemporaryDirectory() as tmp:
        fname = os.path.join(tmp, "save.pkl")
        res_interrupted = _run_static(maxiter_first=300, fname=fname,
                                      proposal_mode=proposal_mode)
    res_full = _run_static(proposal_mode=proposal_mode)
    # the resumed run must continue identically: bit-identical outputs
    assert res_interrupted.niter == res_full.niter
    assert np.array_equal(res_interrupted.logz, res_full.logz)
    assert np.array_equal(res_interrupted.logl, res_full.logl)
    assert np.array_equal(np.asarray(res_interrupted.samples),
                          np.asarray(res_full.samples))


def _run_dynamic(fname=None, interrupt_batches=False):
    loglike, ptform = _gau()
    rstate = get_rstate()
    dns = dytpu.DynamicNestedSampler(loglike, ptform, NDIM, bound="single",
                                     sample="unif", rstate=rstate,
                                     queue_size=32)
    if fname is None:
        dns.run_nested(nlive_init=120, nlive_batch=80, maxbatch=2,
                       print_progress=False)
        return dns.results
    # run the baseline, save, restore, then add batches
    dns.run_nested(nlive_init=120, maxbatch=0, print_progress=False)
    dns.save(fname)
    del dns, loglike, ptform
    dns2 = dytpu.DynamicNestedSampler.restore(fname)
    for _ in range(2):
        dns2.add_batch(nlive=80, print_progress=False)
    return dns2.results


def test_dynamic_save_restore():
    with tempfile.TemporaryDirectory() as tmp:
        fname = os.path.join(tmp, "dsave.pkl")
        res = _run_dynamic(fname=fname)
    assert res.isdynamic()
    assert abs(res.logz[-1] - LOGZ_TRUTH) < 5 * res.logzerr[-1]
    assert len(res.batch_nlive) == 3


def test_checkpoint_file_written():
    loglike, ptform = _gau()
    rstate = get_rstate()
    with tempfile.TemporaryDirectory() as tmp:
        fname = os.path.join(tmp, "ckpt.pkl")
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                      bound="single", sample="unif",
                                      rstate=rstate, queue_size=32)
        sampler.run_nested(print_progress=False, checkpoint_file=fname,
                           checkpoint_every=0.0)
        assert os.path.exists(fname)
        restored = dytpu.NestedSampler.restore(fname)
        assert restored.it == sampler.it


def test_pickle_roundtrip():
    import pickle

    loglike, ptform = _gau()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=32)
    sampler.run_nested(maxiter=200, print_progress=False, add_live=False)
    blob = pickle.dumps(sampler)
    sampler2 = pickle.loads(blob)
    sampler2.run_nested(resume=True, maxiter=250, print_progress=False,
                        add_live=False)
    assert sampler2.it >= sampler.it


def _measure_runtime(dynamic, tmp):
    """Wall-clock of one full (uninterrupted) fit in a child process."""
    import multiprocessing as mp
    import time

    import resume_child

    ctx = mp.get_context("spawn")
    queue = ctx.Queue()
    fname = os.path.join(tmp, "full.pkl")
    t0 = time.time()
    p = ctx.Process(target=resume_child.child_main,
                    args=(dynamic, fname, queue))
    p.start()
    full = queue.get(timeout=600)
    p.join()
    return time.time() - t0, full


_FULL_RUN_CACHE = {}


def _sigterm_resume_case(dynamic, frac):
    """Kill a checkpointing child at ``frac`` of its measured runtime,
    restore, finish, and require the final result to be bit-identical to
    the uninterrupted run (reference ``tests/test_resume.py:106-109``)."""
    import multiprocessing as mp
    import time

    import pytest
    import resume_child

    with tempfile.TemporaryDirectory() as tmp:
        if dynamic not in _FULL_RUN_CACHE:
            _FULL_RUN_CACHE[dynamic] = _measure_runtime(dynamic, tmp)
        runtime, full = _FULL_RUN_CACHE[dynamic]
        ctx = mp.get_context("spawn")
        queue = ctx.Queue()
        fname = os.path.join(tmp, "interrupted.pkl")
        p = ctx.Process(target=resume_child.child_main,
                        args=(dynamic, fname, queue))
        p.start()
        time.sleep(frac * runtime)
        p.terminate()
        p.join()
        if not os.path.exists(fname):
            # killed before the first checkpoint could be written (can
            # happen at small fractions when compile dominates)
            pytest.skip("child killed before first checkpoint")
        resumed = resume_child.resume_fit(dynamic, fname)
    assert resumed[0] == full[0], (resumed, full)  # logz bit-identical
    assert resumed[1] == full[1], (resumed, full)  # logzerr bit-identical
    assert resumed[2] == full[2], (resumed, full)  # niter identical


import pytest  # noqa: E402


@pytest.mark.parametrize("frac", [0.5, 0.9])
def test_sigterm_resume_static(frac):
    _sigterm_resume_case(False, frac)


@pytest.mark.parametrize("frac", [0.5, 0.9])
def test_sigterm_resume_dynamic(frac):
    _sigterm_resume_case(True, frac)


@pytest.mark.slow
@pytest.mark.parametrize("dynamic", [False, True])
@pytest.mark.parametrize("frac", [0.2, 0.75])
def test_sigterm_resume_more_fractions(dynamic, frac):
    _sigterm_resume_case(dynamic, frac)


def np_gau_loglike(x):
    return -0.5 * np.dot(x, _CINV @ x) + _LNORM


def test_resume_pool_size_change():
    """Restoring a checkpoint with a DIFFERENT-size pool must continue
    the run (reference ``tests/test_resume.py:235-303``); with ordered
    maps the result is bit-identical to the uninterrupted run."""
    from dynesty_tpu.pool import Pool

    def run(npool, maxiter_first=None, fname=None, npool_resume=None):
        rstate = get_rstate()
        with Pool(npool, np_gau_loglike, gau_ptform) as pool:
            s = dytpu.NestedSampler(pool.loglike, pool.prior_transform,
                                    NDIM, nlive=100, bound="single",
                                    sample="unif", rstate=rstate,
                                    likelihood_mode="host", pool=pool,
                                    queue_size=16)
            if maxiter_first is None:
                s.run_nested(print_progress=False)
                return s.results
            s.run_nested(maxiter=maxiter_first, add_live=False,
                         print_progress=False)
            s.save(fname)
        with Pool(npool_resume, np_gau_loglike, gau_ptform) as pool2:
            s2 = dytpu.NestedSampler.restore(fname, pool=pool2)
            s2.run_nested(resume=True, print_progress=False)
            return s2.results

    with tempfile.TemporaryDirectory() as tmp:
        fname = os.path.join(tmp, "poolresize.pkl")
        res_resumed = run(2, maxiter_first=250, fname=fname,
                          npool_resume=3)
    res_full = run(2)
    assert res_resumed.niter == res_full.niter
    assert np.array_equal(res_resumed.logz, res_full.logz)
    assert np.array_equal(res_resumed.logl, res_full.logl)


def test_dynamic_midbatch_resume():
    # a maxiter interrupt mid-batch SUSPENDS the batch (it is not
    # truncated); pickling and finishing via add_batch(resume=True)
    # must reproduce the uninterrupted run bit-identically (reference
    # tests/test_resume.py:106-109 invariant)
    import pickle

    def run(interrupt):
        rstate = get_rstate()
        dns = dytpu.DynamicNestedSampler(gau_loglike, gau_ptform, NDIM,
                                         bound="single", sample="unif",
                                         rstate=rstate, queue_size=32)
        dns.run_nested(nlive_init=120, maxbatch=0, print_progress=False)
        if not interrupt:
            dns.add_batch(nlive=80, print_progress=False)
            return dns.results
        # start the batch but stop partway through (maxiter covers the
        # 80 seeding iterations plus ~40 batch iterations), pickle,
        # restore, finish the SAME batch
        dns.add_batch(nlive=80, maxiter=120, print_progress=False)
        assert dns.batch_sampler is not None  # suspended, not truncated
        dns2 = pickle.loads(pickle.dumps(dns))
        assert dns2.batch_sampler is not None
        dns2.add_batch(nlive=80, resume=True, print_progress=False)
        assert dns2.batch_sampler is None
        return dns2.results

    full = run(False)
    resumed = run(True)
    assert resumed.niter == full.niter
    assert np.array_equal(np.asarray(resumed.logz),
                          np.asarray(full.logz))
    assert np.array_equal(np.asarray(resumed.logl),
                          np.asarray(full.logl))
    assert np.array_equal(np.asarray(resumed.samples),
                          np.asarray(full.samples))
