"""Reproduce the BENCHMARKS.md baseline-suite rows on the live device.

Each row mirrors a reference dynesty configuration from SURVEY.md §6 /
BASELINE.md (reference analogues: ``/root/reference/tests/test_gau.py``,
``demos/Examples -- Eggbox.ipynb``, ``demos/Examples -- Gaussian
Shells.ipynb``).  Prints one JSON line per row with wall-clock, ncall,
logz, and the pull vs the analytic truth.

Run:  python examples/baseline_suite.py [row ...]
Rows: gauss3 eggbox shells dynamic3 dynamic3_sweep
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

import dynesty_tpu as dytpu
from dynesty_tpu.models import CorrelatedGaussian, Eggbox, GaussianShells

SEED = 56432

# module-level problem instances: the process-wide trace cache is keyed
# by the likelihood callable, so sharing one instance across the warm-up
# and the timed run (the steady-state usage pattern) keeps the timed
# window trace-free
_GAUSS3 = CorrelatedGaussian(ndim=3)
_EGGBOX = Eggbox()
_SHELLS = GaussianShells()


def _report(name, elapsed, sampler, truth, extra=None):
    res = sampler.results
    logz = float(res.logz[-1])
    logzerr = float(res.logzerr[-1])
    rec = {
        "row": name,
        "wall_s": round(elapsed, 2),
        "ncall": int(np.sum(res.ncall)),
        "niter": int(res.niter),
        "logz": round(logz, 3),
        "logzerr": round(logzerr, 3),
        "pull": round((logz - truth) / logzerr, 2),
    }
    if extra:
        rec.update(extra)
    print(json.dumps(rec), flush=True)
    return rec


def _warm(factory, **run_kw):
    """A FULL warm run so every fused-program variant the measured run
    hits (unit-cube, each padded-ellipsoid bucket, add_live sweep) is
    compiled outside the timed window; traces and compiled programs are
    shared process-wide."""
    s = factory(np.random.Generator(np.random.PCG64(1)))
    s.run_nested(print_progress=False, **run_kw)


def gauss3():
    prob = _GAUSS3

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 3,
                                   nlive=500, bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)

    _warm(factory)
    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = factory(rstate)
    s.run_nested(print_progress=False)
    _report("gauss3_multi_unif", time.time() - t0, s, prob.logz_truth)


def eggbox():
    prob = _EGGBOX

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=1000, bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)

    _warm(factory, dlogz=0.01)
    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = factory(rstate)
    s.run_nested(dlogz=0.01, print_progress=False)
    _report("eggbox_multi_unif", time.time() - t0, s, prob.logz_truth)


def eggbox_sweep():
    """6-seed pull sweep of the eggbox row (single-seed pulls on this
    multimodal problem scatter widely; the sweep is the calibration
    evidence)."""
    prob = _EGGBOX

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=1000, bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)

    _warm(factory, dlogz=0.01)
    pulls = []
    for seed in (SEED, 1001, 1002, 1003, 1004, 1005):
        rstate = np.random.Generator(np.random.PCG64(seed))
        t0 = time.time()
        s = factory(rstate)
        s.run_nested(dlogz=0.01, print_progress=False)
        rec = _report("eggbox_sweep", time.time() - t0, s, prob.logz_truth,
                      extra={"seed": seed})
        pulls.append(rec["pull"])
    print(json.dumps({"row": "eggbox_sweep_summary", "pulls": pulls,
                      "mean": round(float(np.mean(pulls)), 2),
                      "scatter": round(float(np.std(pulls)), 2)}),
          flush=True)


def shells():
    """Published config (`demos/Examples -- Gaussian Shells.ipynb`
    sampling loop): nlive=1000, multi/unif, dlogz=0.05.  Reference on
    this host at this config: ncall 58,757, logz -1.896 +- 0.061
    (-2.4 sigma from the -1.75 truth), 30.2 s."""
    prob = _SHELLS

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=1000, bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)

    _warm(factory, dlogz=0.05)
    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = factory(rstate)
    s.run_nested(dlogz=0.05, print_progress=False)
    _report("shells_multi_unif", time.time() - t0, s, prob.logz_truth)


def shells_default():
    """Same problem at the default dlogz (~1.0): reference on this host
    ncall 33,681, logz -1.895 +- 0.126, 6.6 s."""
    prob = _SHELLS

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=1000, bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)

    _warm(factory)
    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = factory(rstate)
    s.run_nested(print_progress=False)
    _report("shells_default_dlogz", time.time() - t0, s, prob.logz_truth)


def _dynamic3_once(seed, name="dynamic3_multi_unif"):
    prob = _GAUSS3
    rstate = np.random.Generator(np.random.PCG64(seed))
    t0 = time.time()
    s = dytpu.DynamicNestedSampler(prob.loglike, prob.ptform, 3,
                                   bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)
    s.run_nested(print_progress=False)
    return _report(name, time.time() - t0, s, prob.logz_truth,
                   extra={"seed": seed,
                          "n_batches": int(
                              len(s.results.batch_logl_bounds))})


def dynamic3():
    prob = _GAUSS3
    warm = dytpu.DynamicNestedSampler(prob.loglike, prob.ptform, 3,
                                      bound="multi", sample="unif",
                                      rstate=np.random.Generator(
                                          np.random.PCG64(1)),
                                      queue_size=256)
    warm.run_nested(print_progress=False)
    _dynamic3_once(SEED)


def dynamic3_sweep():
    """6-seed pull sweep of the dynamic row (BENCHMARKS.md validation)."""
    dynamic3()  # warm + seed 56432
    pulls = []
    for seed in (1001, 1002, 1003, 1004, 1005):
        rec = _dynamic3_once(seed, name="dynamic3_sweep")
        pulls.append(rec["pull"])
    print(json.dumps({"row": "dynamic3_sweep_summary", "pulls": pulls,
                      "mean": round(float(np.mean(pulls)), 2),
                      "scatter": round(float(np.std(pulls)), 2)}),
          flush=True)


ROWS = {"gauss3": gauss3, "eggbox": eggbox, "eggbox_sweep": eggbox_sweep,
        "shells": shells, "shells_default": shells_default,
        "dynamic3": dynamic3, "dynamic3_sweep": dynamic3_sweep}


if __name__ == "__main__":
    names = sys.argv[1:] or ["gauss3", "eggbox", "shells", "dynamic3"]
    for n in names:
        ROWS[n]()
