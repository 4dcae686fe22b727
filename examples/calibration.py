"""Round-4 statistical-calibration harness (VERDICT items 2-4).

Multi-seed pull sweeps of the eggbox / Gaussian-shells / dynamic-3-D
rows, ours vs the reference at matched seeds, with dtype and
proposal-mode arms so systematic offsets can be attributed.  Each arm
is meant to run in its own process (f64 arms need JAX_ENABLE_X64=1 and
a CPU backend; TPU has no native f64).

Reference truths: eggbox 235.856 (``/root/reference/tests/test_egg.py:26``),
shells -1.75 (``demos/Examples -- Gaussian Shells.ipynb``), 3-D
correlated Gaussian -8.99 (``/root/reference/tests/test_gau.py``).

Usage:
  python examples/calibration.py <row>_<impl> [out.jsonl] [n_seeds]
    rows:  eggbox | shells | dynamic3
    impls: f32 | f64 | queue | ref
  python examples/calibration.py summary out.jsonl
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

ALL_SEEDS = (56432, 1001, 1002, 1003, 1004, 1005,
             1006, 1007, 1008, 1009, 1010, 1011)

TRUTHS = {"eggbox": 235.856, "eggboxgate": 235.856, "shells": -1.75,
          "dynamic3": None}
# dynamic3 truth filled from the problem instance (depends on cov)


def _emit(fh, rec):
    line = json.dumps(rec)
    print(line, flush=True)
    fh.write(line + "\n")
    fh.flush()


def _ours_static(row, fh, seeds, dtype_name, mode, nlive=1000,
                 queue_size=256):
    import jax
    import jax.numpy as jnp
    import dynesty_tpu as dytpu
    from dynesty_tpu.models import Eggbox, GaussianShells

    if dtype_name == "f64" and not jax.config.x64_enabled:
        raise RuntimeError("f64 arm needs JAX_ENABLE_X64=1")
    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    prob = Eggbox() if row.startswith("eggbox") else GaussianShells()
    dlogz = 0.01 if row.startswith("eggbox") else 0.05
    truth = TRUTHS[row]
    label = f"{row}_{dtype_name}_{mode}"

    def factory(rstate):
        return dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                   nlive=nlive, bound="multi",
                                   sample="unif", queue_size=queue_size,
                                   rstate=rstate, dtype=dtype,
                                   proposal_mode=mode)

    warm = factory(np.random.Generator(np.random.PCG64(1)))
    warm.run_nested(dlogz=dlogz, print_progress=False)
    for seed in seeds:
        t0 = time.time()
        s = factory(np.random.Generator(np.random.PCG64(seed)))
        s.run_nested(dlogz=dlogz, print_progress=False)
        res = s.results
        logz, err = float(res.logz[-1]), float(res.logzerr[-1])
        _emit(fh, {"impl": label, "seed": seed, "logz": round(logz, 3),
                   "logzerr": round(err, 3),
                   "pull": round((logz - truth) / err, 2),
                   "ncall": int(np.sum(res.ncall)),
                   "wall_s": round(time.time() - t0, 2)})


def _ref_static(row, fh, seeds):
    _stage_reference()
    import dynesty as refdy

    if row == "eggbox":
        tmax = 5.0 * np.pi

        def loglike(x):
            t = 2.0 * tmax * x - tmax
            return (2.0 + np.cos(t[0] / 2.0) * np.cos(t[1] / 2.0)) ** 5.0

        def ptform(u):
            return u
        dlogz = 0.01
    else:
        r, w = 2.0, 0.1
        c1 = np.array([-3.5, 0.0])
        c2 = np.array([3.5, 0.0])
        lnorm = -np.log(np.sqrt(2.0 * np.pi) * w)

        def _shell(x, c):
            d = np.linalg.norm(x - c)
            return -((d - r) ** 2) / (2.0 * w ** 2) + lnorm

        def loglike(x):
            return np.logaddexp(_shell(x, c1), _shell(x, c2))

        def ptform(u):
            return 6.0 * (2.0 * u - 1.0)
        dlogz = 0.05
    truth = TRUTHS[row]

    for seed in seeds:
        t0 = time.time()
        s = refdy.NestedSampler(loglike, ptform, 2, nlive=1000,
                                bound="multi", sample="unif",
                                rstate=np.random.Generator(
                                    np.random.PCG64(seed)))
        s.run_nested(dlogz=dlogz, print_progress=False)
        res = s.results
        logz, err = float(res.logz[-1]), float(res.logzerr[-1])
        _emit(fh, {"impl": f"{row}_ref", "seed": seed,
                   "logz": round(logz, 3), "logzerr": round(err, 3),
                   "pull": round((logz - truth) / err, 2),
                   "ncall": int(np.sum(res.ncall)),
                   "wall_s": round(time.time() - t0, 2)})


def _dynamic3_ours(fh, seeds, impl="f32"):
    """Arms (round-5 over-dispersion decomposition, VERDICT item 9):

    * ``f32``/``f64`` — defaults (stop function decides the batches).
    * ``nostop`` — ``use_stop=False`` with a fixed 6-batch budget:
      removes stop-function-induced run-length variability.
    * ``jitter`` — defaults, but the pull uses a jitter-realization
      logzerr (std of logz over 50 ``jitter_run`` draws) instead of the
      sawtooth estimate: if this calibrates the scatter to ~1, the
      excess width is logzerr underestimation, not batch targeting.
    """
    import jax
    import jax.numpy as jnp
    import dynesty_tpu as dytpu
    from dynesty_tpu.models import CorrelatedGaussian

    prob = CorrelatedGaussian(ndim=3)
    dtype_name = "f64" if impl == "f64" else "f32"
    dtype = jnp.float64 if dtype_name == "f64" else jnp.float32
    if dtype_name == "f64" and not jax.config.x64_enabled:
        raise RuntimeError("f64 arm needs JAX_ENABLE_X64=1")
    run_kw = {}
    if impl == "nostop":
        run_kw = dict(use_stop=False, maxbatch=6)

    def factory(rstate):
        return dytpu.DynamicNestedSampler(prob.loglike, prob.ptform, 3,
                                          bound="multi", sample="unif",
                                          rstate=rstate, queue_size=256,
                                          dtype=dtype)

    warm = factory(np.random.Generator(np.random.PCG64(1)))
    warm.run_nested(print_progress=False, **run_kw)
    for seed in seeds:
        t0 = time.time()
        s = factory(np.random.Generator(np.random.PCG64(seed)))
        s.run_nested(print_progress=False, **run_kw)
        res = s.results
        logz, err = float(res.logz[-1]), float(res.logzerr[-1])
        rec = {"impl": f"dynamic3_{impl}", "seed": seed,
               "logz": round(logz, 3), "logzerr": round(err, 3),
               "pull": round((logz - prob.logz_truth) / err, 2),
               "ncall": int(np.sum(res.ncall)),
               "n_batches": int(len(res.batch_logl_bounds)),
               "wall_s": round(time.time() - t0, 2)}
        if impl == "jitter":
            from dynesty_tpu.utils.runs import jitter_run
            rj = np.random.Generator(np.random.PCG64(seed + 777))
            zs = [float(jitter_run(res, rstate=rj).logz[-1])
                  for _ in range(50)]
            err_j = float(np.std(zs))
            rec["logzerr_jitter"] = round(err_j, 3)
            rec["pull"] = round((logz - prob.logz_truth) / err_j, 2)
        _emit(fh, rec)


def _dynamic3_ref(fh, seeds):
    _stage_reference()
    import dynesty as refdy

    # mirror dynesty_tpu.models.CorrelatedGaussian(ndim=3) exactly
    ndim = 3
    win = 10.0
    cov = np.identity(ndim)
    cov[cov == 0] = 0.95
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * ndim + np.log(np.linalg.det(cov)))
    truth = -ndim * np.log(2 * win)

    def loglike(x):
        return float(-0.5 * np.dot(x, cinv @ x) + lnorm)

    def ptform(u):
        return win * (2.0 * u - 1.0)

    for seed in seeds:
        t0 = time.time()
        s = refdy.DynamicNestedSampler(loglike, ptform, ndim,
                                       bound="multi", sample="unif",
                                       rstate=np.random.Generator(
                                           np.random.PCG64(seed)))
        s.run_nested(print_progress=False)
        res = s.results
        logz, err = float(res.logz[-1]), float(res.logzerr[-1])
        _emit(fh, {"impl": "dynamic3_ref", "seed": seed,
                   "logz": round(logz, 3), "logzerr": round(err, 3),
                   "pull": round((logz - truth) / err, 2),
                   "ncall": int(np.sum(res.ncall)),
                   "n_batches": int(len(res.batch_logl_bounds)),
                   "wall_s": round(time.time() - t0, 2)})


def _stage_reference():
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


def summarize(path):
    rows = [json.loads(x) for x in open(path)]
    by = {}
    for r in rows:
        by.setdefault(r["impl"], []).append(r)
    for impl in sorted(by):
        rs = by[impl]
        pulls = np.array([r["pull"] for r in rs])
        ncalls = np.array([r["ncall"] for r in rs])
        print(json.dumps({
            "impl": impl, "n": len(rs),
            "mean_pull": round(float(pulls.mean()), 3),
            "scatter": round(float(pulls.std()), 3),
            "se": round(float(pulls.std() / max(1, np.sqrt(len(rs)))), 3),
            "n_positive": int((pulls > 0).sum()),
            "mean_ncall": int(ncalls.mean())}))


if __name__ == "__main__":
    arm = sys.argv[1]
    out = sys.argv[2] if len(sys.argv) > 2 else f"/tmp/cal_{arm}.jsonl"
    n = int(sys.argv[3]) if len(sys.argv) > 3 else 12
    seeds = ALL_SEEDS[:n]
    if arm == "summary":
        summarize(out)
        sys.exit(0)
    row, impl = arm.rsplit("_", 1)
    with open(out, "a") as fh:
        if row in ("eggbox", "shells"):
            if impl == "ref":
                _ref_static(row, fh, seeds)
            elif impl == "queue":
                _ours_static(row, fh, seeds, "f32", "queue")
            else:
                _ours_static(row, fh, seeds, impl, "batch")
        elif row == "eggboxgate":
            # the slow-tier mean-pull gate's exact configuration
            # (tests/test_static.py::test_eggbox_mean_pull)
            _ours_static(row, fh, seeds, impl, "batch", nlive=300,
                         queue_size=128)
        elif row == "dynamic3":
            if impl == "ref":
                _dynamic3_ref(fh, seeds)
            else:
                _dynamic3_ours(fh, seeds, impl)
