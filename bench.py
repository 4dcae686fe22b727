#!/usr/bin/env python
"""Headline benchmark: 25-D correlated normal, static nested sampling with
random-slice proposals, slices=25 (the reference's heaviest published
config: ``demos/Examples -- 25-D Correlated Normal.ipynb``, published
ncall 2,490,333; measured on this host: 3,182,846).

Prints ONE JSON line:
  {"metric": "wallclock_25d_rslice", "value": <seconds>, "unit": "s",
   "vs_baseline": <reference_seconds / our_seconds>, ...}

``vs_baseline`` compares against reference dynesty (pure numpy, one CPU
core) at the SAME config measured on this machine: 109.2 s (slices=25,
ncall 3.18M, logz -74.12+-0.47; measured 2026-08-16 on the driver host).
Set BENCH_MEASURE_REFERENCE=1 to re-measure the reference instead of using
the recorded constant (requires /root/reference mounted).

The run must also be CORRECT: the JSON includes the logz pull vs the
analytic truth, and the benchmark aborts (vs_baseline=0) if |pull| > 5.
"""

import json
import os
import sys
import time

import numpy as np

REF_SECONDS = 109.2  # reference dynesty, same problem+config, this host
NDIM = 25
NLIVE = 500
QUEUE = 256
ROUNDS = 24
SLICES = 25  # fused rounds per device dispatch (amortizes relay latency)
SEED = 56432
TRUTH = -NDIM * np.log(20.0)


def _measure_reference():
    sys.path.insert(0, "/tmp/refpkg")
    if not os.path.exists("/tmp/refpkg/dynesty"):
        import shutil
        shutil.copytree("/root/reference/py/dynesty", "/tmp/refpkg/dynesty")
        init = "/tmp/refpkg/dynesty/__init__.py"
        src = open(init).read()
        src = src.replace(
            "except PackageNotFoundError:\n    # package is not installed"
            "\n    pass",
            "except PackageNotFoundError:\n    __version__ = '3.0.0'")
        open(init, "w").write(src)
    import dynesty as refdy

    cov = np.identity(NDIM)
    cov[cov == 0] = 0.4
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * NDIM +
                    np.log(np.linalg.det(cov)))

    def loglike(x):
        return -0.5 * np.dot(x, cinv @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = refdy.NestedSampler(loglike, ptform, NDIM, nlive=NLIVE,
                            bound="single", sample="rslice", slices=SLICES,
                            rstate=rstate)
    s.run_nested(print_progress=False)
    return time.time() - t0


def main():
    import jax.numpy as jnp
    import dynesty_tpu as dytpu

    cov = np.identity(NDIM)
    cov[cov == 0] = 0.4
    cinv = np.linalg.inv(cov).astype(np.float32)
    lnorm = float(-0.5 * (np.log(2 * np.pi) * NDIM +
                          np.log(np.linalg.det(cov))))
    cinv_j = jnp.asarray(cinv)

    def loglike(x):
        return -0.5 * jnp.dot(x, cinv_j @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    # Warm-up run (tiny) to move compilation out of the measured window;
    # compiled programs persist in the on-disk cache across processes.
    rstate = np.random.Generator(np.random.PCG64(1))
    warm = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=NLIVE,
                               bound="single", sample="rslice",
                               slices=SLICES,
                               rstate=rstate, queue_size=QUEUE,
                               rounds_per_dispatch=ROUNDS)
    # two dispatches: the first runs the unit-cube variant, the second
    # (after the first bound refit) the ellipsoid variant — so both
    # fused programs are traced AND compiled before the timed window
    # (the traces are shared across sampler instances process-wide)
    warm.run_nested(maxiter=2 * QUEUE * ROUNDS + 1, print_progress=False,
                    add_live=False)

    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=NLIVE,
                                  bound="single", sample="rslice",
                                  slices=SLICES,
                                  rstate=rstate, queue_size=QUEUE,
                                  rounds_per_dispatch=ROUNDS)
    sampler.run_nested(print_progress=False)
    elapsed = time.time() - t0
    res = sampler.results

    ref_seconds = REF_SECONDS
    if os.environ.get("BENCH_MEASURE_REFERENCE"):
        ref_seconds = _measure_reference()

    pull = float((res.logz[-1] - TRUTH) / res.logzerr[-1])
    ok = abs(pull) < 5
    out = {
        "metric": "wallclock_25d_rslice",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(ref_seconds / elapsed, 2) if ok else 0.0,
        "logz": round(float(res.logz[-1]), 2),
        "logzerr": round(float(res.logzerr[-1]), 2),
        "logz_pull": round(pull, 2),
        "ncall": int(np.sum(res.ncall)),
        "ref_seconds": ref_seconds,
    }
    print(json.dumps(out))


if __name__ == "__main__":
    main()
