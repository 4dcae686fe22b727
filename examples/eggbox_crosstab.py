"""Eggbox bias cross-tab (round-4 calibration, VERDICT item 2).

The round-3 6-seed eggbox sweep showed an all-positive pull
distribution (mean +1.30, ~+4.8 s.e. from zero).  This harness
cross-tabulates the same problem over >=12 seeds across
{f32 batch (default), f64 batch, f32 queue} and runs the reference
dynesty at the same seeds, so the bias can be attributed to (a) f32
device thresholds, (b) batched-proposal bookkeeping, or (c) a property
the reference shares.  Reference truth 235.856:
``/root/reference/tests/test_egg.py:26``.

Run:  python examples/eggbox_crosstab.py [ours|reference] [out.jsonl]
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SEEDS = (56432, 1001, 1002, 1003, 1004, 1005,
         1006, 1007, 1008, 1009, 1010, 1011)
TRUTH = 235.856
NLIVE = 1000
DLOGZ = 0.01


def _emit(fh, rec):
    line = json.dumps(rec)
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


def run_ours(fh, only=None):
    import jax
    import jax.numpy as jnp
    import dynesty_tpu as dytpu
    from dynesty_tpu.models import Eggbox

    prob = Eggbox()
    # f64 requires an x64-enabled process on a CPU backend (TPU has no
    # native f64); f32 arms must pin the dtype explicitly so they stay
    # f32 even if run inside an x64 process.
    configs = {
        "f32_batch": dict(proposal_mode="batch", dtype=jnp.float32),
        "f64_batch": dict(proposal_mode="batch", dtype=jnp.float64),
        "f32_queue": dict(proposal_mode="queue", dtype=jnp.float32),
    }
    if only:
        configs = {k: v for k, v in configs.items() if k in only}
    for name, kw in configs.items():
        if name.startswith("f64") and not jax.config.x64_enabled:
            raise RuntimeError("f64 arm needs JAX_ENABLE_X64=1")
        # warm run outside the per-seed timing (shared trace cache)
        warm = dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=NLIVE, bound="multi",
                                   sample="unif", queue_size=256,
                                   rstate=np.random.Generator(
                                       np.random.PCG64(1)), **kw)
        warm.run_nested(dlogz=DLOGZ, print_progress=False)
        for seed in SEEDS:
            rstate = np.random.Generator(np.random.PCG64(seed))
            t0 = time.time()
            s = dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                    nlive=NLIVE, bound="multi",
                                    sample="unif", queue_size=256,
                                    rstate=rstate, **kw)
            s.run_nested(dlogz=DLOGZ, print_progress=False)
            res = s.results
            logz = float(res.logz[-1])
            err = float(res.logzerr[-1])
            _emit(fh, {"impl": name, "seed": seed,
                       "logz": round(logz, 3), "logzerr": round(err, 3),
                       "pull": round((logz - TRUTH) / err, 2),
                       "ncall": int(np.sum(res.ncall)),
                       "wall_s": round(time.time() - t0, 2)})


def run_reference(fh):
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

    tmax = 5.0 * np.pi

    def loglike(x):
        t = 2.0 * tmax * x - tmax
        return (2.0 + np.cos(t[0] / 2.0) * np.cos(t[1] / 2.0)) ** 5.0

    def ptform(u):
        return u

    for seed in SEEDS:
        rstate = np.random.Generator(np.random.PCG64(seed))
        t0 = time.time()
        s = refdy.NestedSampler(loglike, ptform, 2, nlive=NLIVE,
                                bound="multi", sample="unif",
                                rstate=rstate)
        s.run_nested(dlogz=DLOGZ, print_progress=False)
        res = s.results
        logz = float(res.logz[-1])
        err = float(res.logzerr[-1])
        _emit(fh, {"impl": "reference", "seed": seed,
                   "logz": round(logz, 3), "logzerr": round(err, 3),
                   "pull": round((logz - TRUTH) / err, 2),
                   "ncall": int(np.sum(res.ncall)),
                   "wall_s": round(time.time() - t0, 2)})


def summarize(path):
    rows = [json.loads(x) for x in open(path)]
    by = {}
    for r in rows:
        by.setdefault(r["impl"], []).append(r)
    for impl, rs in by.items():
        pulls = np.array([r["pull"] for r in rs])
        ncalls = np.array([r["ncall"] for r in rs])
        print(json.dumps({
            "impl": impl, "n": len(rs),
            "mean_pull": round(float(pulls.mean()), 3),
            "scatter": round(float(pulls.std()), 3),
            "se": round(float(pulls.std() / np.sqrt(len(rs))), 3),
            "n_positive": int((pulls > 0).sum()),
            "mean_ncall": int(ncalls.mean())}))


if __name__ == "__main__":
    which = sys.argv[1] if len(sys.argv) > 1 else "ours"
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/eggbox_{which}.jsonl"
    if which == "summary":
        summarize(out)
    elif which == "reference":
        with open(out, "a") as fh:
            run_reference(fh)
    else:
        # which = comma-separated config names, e.g. "f32_batch,f32_queue"
        only = None if which == "ours" else set(which.split(","))
        with open(out, "a") as fh:
            run_ours(fh, only=only)
