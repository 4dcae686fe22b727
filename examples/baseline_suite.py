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
    """One tiny run to move compilation out of the measured window."""
    s = factory(np.random.Generator(np.random.PCG64(1)))
    s.run_nested(maxiter=300, print_progress=False, add_live=False,
                 **run_kw)


def gauss3():
    prob = CorrelatedGaussian(ndim=3)

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
    prob = Eggbox()

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=1000, bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)

    _warm(factory)
    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = factory(rstate)
    s.run_nested(dlogz=0.01, print_progress=False)
    _report("eggbox_multi_unif", time.time() - t0, s, prob.logz_truth)


def shells():
    prob = GaussianShells()

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=1000, bound="multi", sample="unif",
                                   rstate=rstate, queue_size=256)

    _warm(factory)
    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = factory(rstate)
    s.run_nested(dlogz=0.1, print_progress=False)
    _report("shells_multi_unif", time.time() - t0, s, prob.logz_truth)


def _dynamic3_once(seed, name="dynamic3_multi_unif"):
    prob = CorrelatedGaussian(ndim=3)
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
    prob = CorrelatedGaussian(ndim=3)
    warm = dytpu.DynamicNestedSampler(prob.loglike, prob.ptform, 3,
                                      bound="multi", sample="unif",
                                      rstate=np.random.Generator(
                                          np.random.PCG64(1)),
                                      queue_size=256)
    warm.run_nested(maxiter=600, maxbatch=1, print_progress=False)
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


ROWS = {"gauss3": gauss3, "eggbox": eggbox, "shells": shells,
        "dynamic3": dynamic3, "dynamic3_sweep": dynamic3_sweep}


if __name__ == "__main__":
    names = sys.argv[1:] or ["gauss3", "eggbox", "shells", "dynamic3"]
    for n in names:
        ROWS[n]()
