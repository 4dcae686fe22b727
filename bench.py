#!/usr/bin/env python
"""Headline benchmark: 25-D correlated normal, static nested sampling with
random-slice proposals, slices=25 (the reference's heaviest published
config: ``demos/Examples -- 25-D Correlated Normal.ipynb``, published
ncall 2,490,333; measured on this host: 3,182,846).

Prints ONE JSON line:
  {"metric": "wallclock_25d_rslice", "value": <seconds>, "unit": "s",
   "vs_baseline": <reference_seconds / our_seconds>, ...,
   "heavy": {...}}

``vs_baseline`` compares against reference dynesty (pure numpy, one CPU
core) at the SAME config measured on this machine: 109.2 s (slices=25,
ncall 3.18M, logz -74.12+-0.47; measured 2026-08-16 on the driver host).
Set BENCH_MEASURE_REFERENCE=1 to re-measure the reference instead of using
the recorded constant (requires /root/reference mounted).

The ``heavy`` sub-record benchmarks the regime a TPU framework exists
for: an EXPENSIVE traceable likelihood (a 96-layer 256x256 tanh matvec
chain per point, ~1.5 ms/call in numpy on one CPU core) on the 3-D
correlated Gaussian, reporting wall-clock vs the same-host reference,
achieved likelihood evaluations/s, the device throughput ceiling for the
same batched likelihood (measured by chaining batch evaluations inside
one dispatch), and the implied device duty cycle.

The run must also be CORRECT: the JSON includes the logz pull vs the
analytic truth, and the benchmark aborts (vs_baseline=0) if |pull| > 5.
"""

import json
import os
import sys
import time

import numpy as np

REF_SECONDS = 109.2  # reference dynesty, same problem+config, this host

# Provenance of the recorded reference denominators: if the current host
# does not match this fingerprint the constants are STALE and the bench
# re-measures the reference live (same effect as BENCH_MEASURE_REFERENCE=1)
# so vs_baseline can never silently inherit another machine's numbers.
REF_MEASURED_ON = "2026-08-16/17"
REF_HOST_FINGERPRINT = "Intel(R) Xeon(R) Processor @ 2.10GHz/x1"


def _host_fingerprint():
    model = "unknown"
    try:
        with open("/proc/cpuinfo") as fh:
            for line in fh:
                if line.startswith("model name"):
                    model = line.split(":", 1)[1].strip()
                    break
    except OSError:
        pass
    return f"{model}/x{os.cpu_count()}"


def _ref_constants_stale():
    return _host_fingerprint() != REF_HOST_FINGERPRINT
NDIM = 25
NLIVE = 500
QUEUE = 256
ROUNDS = 24
SLICES = 25  # fused rounds per device dispatch (amortizes relay latency)
SEED = 56432
TRUTH = -NDIM * np.log(20.0)

# -- heavy-likelihood benchmark (3-D correlated Gaussian + matvec chain) --
H_NDIM = 3
# nlive deep enough that the timed run spans >=10 dispatches at 12
# chained rounds x 256 lanes — the whole-run duty cycle then measures
# steady-state dispatch behavior instead of one-time costs (compile
# probe, first refit, terminal consume), and a steady-state-window duty
# is reported alongside it (round-4 verdict: at nlive=500 the run fit
# in 2 dispatches and saturated as an instrument)
H_NLIVE = 3000
H_WIDTH = 256  # matvec chain width
H_LAYERS = 384  # chain depth; ~6 ms/call in numpy on one CPU core
H_TRUTH = -H_NDIM * np.log(20.0)  # 1e-6 tanh perturbation is negligible
H_ROUNDS = 12  # explicit: lifts the unif chain cap (expensive likelihood)
HEAVY_REF_SECONDS = 705.8  # reference dynesty, heavy 3-D (nlive=3000,
# depth-384 chain, ~6 ms/call), measured live 2026-08-20 on the
# fingerprinted host below (ncall-equivalent config; stale-fingerprint
# hosts re-measure automatically)


def _heavy_weights():
    """Fixed, well-conditioned chain weights (shared numpy/JAX)."""
    rng = np.random.Generator(np.random.PCG64(1234))
    a = rng.standard_normal((H_WIDTH, H_WIDTH))
    q, _ = np.linalg.qr(a)
    a = 0.9 * q  # spectral norm 0.9: the tanh chain stays bounded
    w = rng.standard_normal((H_WIDTH, H_NDIM)) / np.sqrt(H_NDIM)
    cov = np.identity(H_NDIM)
    cov[cov == 0] = 0.95
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * H_NDIM +
                    np.log(np.linalg.det(cov)))
    return a, w, cinv, lnorm


def _heavy_loglike_numpy():
    a, w, cinv, lnorm = _heavy_weights()

    def loglike(x):
        h = np.tanh(w @ x)
        for _ in range(H_LAYERS):
            h = np.tanh(a @ h)
        return -0.5 * x @ cinv @ x + lnorm + 1e-6 * h.sum()

    return loglike


def _heavy_loglike_jax():
    import jax.numpy as jnp

    a, w, cinv, lnorm = _heavy_weights()
    a_j = jnp.asarray(a, jnp.float32)
    w_j = jnp.asarray(w, jnp.float32)
    cinv_j = jnp.asarray(cinv)

    def loglike(x):
        h = jnp.tanh(w_j @ x.astype(jnp.float32))
        for _ in range(H_LAYERS):
            h = jnp.tanh(a_j @ h)
        return -0.5 * x @ cinv_j @ x + lnorm + \
            1e-6 * h.sum().astype(x.dtype)

    return loglike


def _heavy_ptform(u):
    return 10.0 * (2.0 * u - 1.0)


def _measure_device_ceiling(loglike, q, reps=200):
    """Device throughput ceiling for the batched likelihood: ``reps``
    batch evaluations chained inside ONE dispatch (a lax.scan), so the
    relay's fixed per-dispatch cost amortizes away.  Returns evals/s.

    The duty-cycle denominator must be stable run-to-run: each timed
    call covers ``reps*q`` evaluations (~100 ms of device work, large
    against relay jitter) and the BEST of five timed calls is taken —
    the ceiling is the device's speed-of-light for this likelihood, so
    transient host/relay stalls must not deflate it (a deflated ceiling
    inflates the reported duty cycle)."""
    import jax
    import jax.numpy as jnp

    @jax.jit
    def run_many(x0):
        def step(x, _):
            logl = jax.vmap(loglike)(x)
            # feed the output back so the chain cannot be elided
            x = x + 1e-12 * logl[:, None]
            return x, logl.sum()

        x, tot = jax.lax.scan(step, x0, None, length=reps)
        return tot.sum()

    x0 = jnp.asarray(
        np.random.Generator(np.random.PCG64(7)).random((q, H_NDIM)))
    run_many(x0).block_until_ready()  # compile
    best = np.inf
    for _ in range(5):
        t0 = time.time()
        run_many(x0).block_until_ready()
        best = min(best, time.time() - t0)
    return reps * q / best


def bench_heavy():
    """Expensive-likelihood regime: 3-D correlated Gaussian with the
    matvec-chain likelihood, multi/unif defaults."""
    import dynesty_tpu as dytpu

    loglike = _heavy_loglike_jax()

    # warm-up (compilation out of the measured window): a FULL tiny-seed
    # run so every fused-program variant the timed run hits (unit-cube,
    # each padded-ellipsoid bucket, add_live sweep) is traced and
    # compiled here; traces are shared across sampler instances
    # process-wide
    warm = dytpu.NestedSampler(loglike, _heavy_ptform, H_NDIM,
                               nlive=H_NLIVE, bound="multi", sample="unif",
                               rstate=np.random.Generator(
                                   np.random.PCG64(1)),
                               queue_size=QUEUE,
                               rounds_per_dispatch=H_ROUNDS)
    warm.run_nested(print_progress=False)

    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    sampler = dytpu.NestedSampler(loglike, _heavy_ptform, H_NDIM,
                                  nlive=H_NLIVE, bound="multi",
                                  sample="unif", rstate=rstate,
                                  queue_size=QUEUE,
                                  rounds_per_dispatch=H_ROUNDS)
    sampler.run_nested(print_progress=False)
    elapsed = time.time() - t0
    res = sampler.results
    ncall = int(sampler.ncall)
    evals_per_s = ncall / elapsed
    ceiling = _measure_device_ceiling(loglike, QUEUE)

    ref_seconds = HEAVY_REF_SECONDS
    ref_provenance = f"recorded {REF_MEASURED_ON} on {REF_HOST_FINGERPRINT}"
    if (ref_seconds is None or os.environ.get("BENCH_MEASURE_REFERENCE")
            or _ref_constants_stale()):
        ref_seconds = _measure_reference_heavy()
        ref_provenance = f"measured live on {_host_fingerprint()}"

    pull = float((res.logz[-1] - H_TRUTH) / res.logzerr[-1])
    ok = abs(pull) < 5
    duty_steady, n_window = _steady_state_duty(sampler.timings, ceiling)
    return {
        "metric": "wallclock_3d_heavy_matvec_chain",
        "value": round(elapsed, 2),
        "unit": "s",
        "vs_baseline": round(ref_seconds / elapsed, 2) if ok else 0.0,
        "logz": round(float(res.logz[-1]), 3),
        "logzerr": round(float(res.logzerr[-1]), 3),
        "logz_pull": round(pull, 2),
        "ncall": ncall,
        "ref_seconds": round(ref_seconds, 1),
        "ref_provenance": ref_provenance,
        "evals_per_s": round(evals_per_s, 1),
        "device_ceiling_evals_per_s": round(ceiling, 1),
        "duty_cycle": round(evals_per_s / ceiling, 4),
        # duty over the steady-state dispatch window (first two and last
        # dispatch marks dropped: compile-cache probe, first refit and
        # terminal consume are one-time costs)
        "duty_cycle_steady": (round(duty_steady, 4)
                              if duty_steady is not None else None),
        "steady_window_dispatches": n_window,
        # per-run wall-clock attribution (dispatch-latency accounting):
        # where the non-device remainder of the duty cycle goes
        "timings": _round_timings(sampler.timings),
    }


def _round_timings(timings):
    return {k: (round(v, 3) if isinstance(v, float) else v)
            for k, v in sorted(timings.items())
            if not isinstance(v, list)}  # event lists stay out of JSON


def _steady_state_duty(timings, ceiling):
    """Duty cycle over the steady-state window: drop the first two and
    the last dispatch marks (compile-cache probe, first refit, terminal
    consume are one-time costs) and measure launched evals per second
    between the remaining marks.  Returns (duty, n_window) or (None, 0)
    when the run has too few dispatches to have a steady state."""
    marks = timings.get("disp_marks", [])
    if len(marks) < 5:
        return None, 0
    window = marks[2:]
    t0 = marks[1][0]
    dt = window[-1][0] - t0
    nc = sum(m[1] for m in window)
    if dt <= 0:
        return None, 0
    return (nc / dt) / ceiling, len(window)


def _measure_reference_heavy():
    _stage_reference()
    import dynesty as refdy

    loglike = _heavy_loglike_numpy()
    rstate = np.random.Generator(np.random.PCG64(SEED))
    t0 = time.time()
    s = refdy.NestedSampler(loglike, _heavy_ptform, H_NDIM,
                            nlive=H_NLIVE, bound="multi", sample="unif",
                            rstate=rstate)
    s.run_nested(print_progress=False)
    return time.time() - t0


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


def _measure_reference():
    _stage_reference()
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
    # a FULL warm run: every fused-program variant the timed run hits
    # (unit-cube, ellipsoid, the pipelined ctrl-derive program, the
    # add-live sweep) is traced and compiled here; traces are shared
    # across sampler instances process-wide.  A budget-capped warm run
    # would skip the ctrl-derive compile: pipelined pre-launches are
    # disabled near finite budgets (sampler._pipeline_capable and the
    # budget guard at the eager-launch site in sampler.sample).
    warm.run_nested(print_progress=False)

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
    ref_provenance = f"recorded {REF_MEASURED_ON} on {REF_HOST_FINGERPRINT}"
    if os.environ.get("BENCH_MEASURE_REFERENCE") or _ref_constants_stale():
        ref_seconds = _measure_reference()
        ref_provenance = f"measured live on {_host_fingerprint()}"

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
        "ref_provenance": ref_provenance,
        "timings": _round_timings(sampler.timings),
    }
    try:
        out["heavy"] = bench_heavy()
    except Exception as exc:  # keep the headline metric alive regardless
        out["heavy"] = {"error": repr(exc)}
    print(json.dumps(out))


if __name__ == "__main__":
    main()
