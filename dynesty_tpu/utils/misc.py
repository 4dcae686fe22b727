"""RNG discipline, weighted statistics, resampling, progress printing.

RNG: host-side decisions use ``numpy.random.Generator`` instances (never
the legacy global state); device-side kernels use JAX PRNG keys derived
deterministically from the same seed via :func:`get_jax_key`.  Per-round
keys are produced with ``jax.random.fold_in`` so runs are reproducible for
a fixed seed, mirroring the reference's SeedSequence fan-out
(``utils.py:993-1009``).
"""

import sys
import time
from collections import namedtuple

import numpy as np

__all__ = [
    "get_random_generator", "get_seed_sequence", "get_jax_key",
    "mean_and_cov", "quantile", "resample_equal", "DelayTimer",
    "IteratorResult", "IteratorResultShort", "print_fn", "get_print_func",
    "PrintFnArgs", "get_print_fn_args", "print_fn_fallback",
    "print_fn_tqdm", "SQRTEPS", "SamplerHistoryItem", "Timings",
]


class Timings(dict):
    """Wall-clock attribution for one sampler run.

    A plain dict of either seconds (float keys like ``dispatch``,
    ``consume``, ``refit``) or counts (int keys like ``n_dispatch``),
    populated by the sampler every run.  The reference exposes only
    eff/ncall counters; this is the TPU build's analogue with the
    host/device split made explicit, so duty-cycle regressions are
    visible per run (printed by ``bench.py``).

    Keys (seconds unless noted):

    * ``dispatch`` — blocked in fused device calls (launch + device
      execution + flat-result download).  With the pipelined dispatch
      loop this is only the *non-overlapped* device wait.
    * ``prelaunch`` — host time spent issuing pipelined pre-launches
      (async; the device work itself overlaps the consume).
    * ``consume`` — host record bookkeeping between dispatches.
    * ``refit`` — host bound refits (BIC resplit, bootstrap).
    * ``mirror`` — device->host live-state downloads.
    * ``add_live`` — final live-point recycling sweep.
    * ``integrals`` — final consistent evidence re-pass.
    * ``total`` — whole ``run_nested`` call.
    * ``n_dispatch`` (count) — fused device dispatches.
    * ``n_prelaunch`` (count) — dispatches launched pipelined (before
      the previous dispatch's results were consumed).
    * ``n_refit`` (count) — host bound refits.
    * ``nc_launched`` (count) — likelihood evaluations launched on
      device (consumed or speculative).
    * ``nc_stranded_pipeline`` (count) — billed evaluations from a
      pipelined pre-launch stranded by a terminal stop.
    """

    def add(self, key, dt):
        self[key] = self.get(key, 0.0) + dt

    def count(self, key, n=1):
        self[key] = self.get(key, 0) + n

    def mark(self, key, entry):
        """Append one event to a per-run event list (e.g.
        ``disp_marks``: one ``(perf_counter, nc_launched)`` tuple per
        fused dispatch, from which bench.py computes the steady-state
        duty-cycle window)."""
        self.setdefault(key, []).append(entry)

    def merge(self, other):
        """Accumulate another run's timings (the dynamic layer sums the
        base run and every batch sampler into one view; event lists
        concatenate)."""
        if other:
            for k, v in other.items():
                if isinstance(v, list):
                    self[k] = self.get(k, []) + v
                else:
                    self[k] = self.get(k, type(v)(0)) + v
        return self

# machine-precision tolerance used by weight normalization checks
# (reference ``utils.py:41``)
SQRTEPS = float(np.sqrt(np.finfo(np.float64).eps))

# one recorded likelihood evaluation (reference ``utils.py:24``); our
# HDF5 history stores columnar arrays, but the namedtuple is part of the
# public surface for custom history consumers
SamplerHistoryItem = namedtuple("SamplerHistoryItem", ["u", "v", "logl"])

IteratorResult = namedtuple("IteratorResult", [
    "worst", "ustar", "vstar", "loglstar", "logvol", "logwt", "logz",
    "logzvar", "h", "nc", "blob", "worst_it", "boundidx", "bounditer",
    "eff", "delta_logz", "proposal_stats", "n", "birth"
], defaults=[None, None])

# reduced record yielded by dynamic batch sampling, where the global
# evidence fields are not updated per-iteration (reference
# ``utils.py:49-52``); carries logz/logzvar defaults so the print tier
# builder can consume either record type
IteratorResultShort = namedtuple("IteratorResultShort", [
    "worst", "ustar", "vstar", "loglstar", "nc", "worst_it", "boundidx",
    "bounditer", "eff", "delta_logz", "proposal_stats", "logz", "logzvar"
], defaults=[-np.inf, 0.0])

# coarse-grained yield of Sampler.sample(per_dispatch=True): one fused
# device dispatch worth of iterations (n accepted records, nc likelihood
# calls including discarded speculative proposals)
IteratorBlock = namedtuple("IteratorBlock", ["n", "nc"])


def get_random_generator(seed=None):
    """A PCG64 numpy Generator from a seed / SeedSequence / Generator."""
    if isinstance(seed, np.random.Generator):
        return seed
    return np.random.Generator(np.random.PCG64(seed))


def get_seed_sequence(rstate, nitems):
    """Spawn ``nitems`` independent child seeds from a Generator's
    underlying SeedSequence."""
    seed_seq = rstate.bit_generator.seed_seq
    return seed_seq.spawn(nitems)


def get_jax_key(rstate):
    """Derive a JAX PRNG key deterministically from a numpy Generator.

    Draws 63 bits from the generator, so consecutive calls give
    independent (and checkpoint-reproducible) keys.
    """
    import jax

    seed = int(rstate.integers(0, 2**63 - 1))
    return jax.random.key(seed)


def mean_and_cov(samples, weights):
    """Weighted mean and (frequency-weight corrected) covariance of
    ``samples`` (n, ndim) under ``weights`` (n,).  Matches the reference
    estimator (``utils.py:1081-1117``)."""
    samples = np.asarray(samples, dtype=np.float64)
    weights = np.asarray(weights, dtype=np.float64)
    wsum = weights.sum()
    mean = np.einsum("i,ij->j", weights, samples) / wsum
    dx = samples - mean
    wt = weights / wsum
    cov = np.einsum("i,ij,ik->jk", wt, dx, dx)
    # correct for the "effective sample size" bias of weighted estimates
    cov /= 1.0 - (wt ** 2).sum()
    return mean, cov


def quantile(x, q, weights=None):
    """Weighted quantiles of 1-D data ``x`` at quantiles ``q`` in [0, 1]
    (reference ``utils.py:1190-1234``)."""
    x = np.atleast_1d(x)
    q = np.atleast_1d(q)
    if np.any(q < 0.0) or np.any(q > 1.0):
        raise ValueError("Quantiles must be between 0. and 1.")
    if weights is None:
        return np.percentile(x, 100.0 * q)
    weights = np.atleast_1d(weights)
    if len(x) != len(weights):
        raise ValueError("Dimension mismatch: len(weights) != len(x).")
    idx = np.argsort(x)
    sw = weights[idx]
    cdf = np.cumsum(sw)[:-1]
    cdf /= cdf[-1]
    cdf = np.append(0, cdf)
    return np.interp(q, cdf, x[idx]).tolist()


def resample_equal(samples, weights, rstate=None):
    """Systematic resampling to equal-weight samples, returned shuffled
    (reference ``utils.py:1120-1187``)."""
    if rstate is None:
        rstate = get_random_generator()
    samples = np.asarray(samples)
    weights = np.asarray(weights, dtype=np.float64)
    if abs(np.sum(weights) - 1.0) > 1e-9:
        weights = weights / weights.sum()
    nsamples = len(weights)
    positions = (rstate.random() + np.arange(nsamples)) / nsamples
    cumulative = np.cumsum(weights)
    cumulative[-1] = 1.0  # guard against round-off
    idx = np.searchsorted(cumulative, positions)
    resampled = samples[idx]
    rstate.shuffle(resampled)
    return resampled


class DelayTimer:
    """Tells whether ``delay`` seconds have elapsed since the last
    affirmative check; used to pace checkpoint writes."""

    def __init__(self, delay):
        self.delay = delay
        self.last_time = time.time()

    def is_time(self):
        if time.time() - self.last_time > self.delay:
            self.last_time = time.time()
            return True
        return False


# --------------------------------------------------------------------------
# progress printing


def _format_status(results, niter, ncall, add_live_it=None, dlogz=None,
                   stop_val=None, nbatch=None, logl_min=-np.inf,
                   logl_max=np.inf):
    loglstar, logz, logzvar = results.loglstar, results.logz, \
        results.logzvar
    nc, eff, delta_logz = results.nc, results.eff, results.delta_logz
    logzerr = np.sqrt(max(logzvar, 0.0))
    delta_logz = min(delta_logz, 1e10)  # readable early-run display
    bits = [f"iter: {niter:d}"]
    if add_live_it is not None:
        bits.append(f"+{add_live_it:d}")
    if nbatch is not None:
        bits.append(f"batch: {nbatch:d}")
    bits.append(f"nc: {nc:d}")
    bits.append(f"ncall: {ncall:d}")
    bits.append(f"eff(%): {eff:6.3f}")
    if logl_min > -np.inf or logl_max < np.inf:
        bits.append(f"loglstar: {logl_min:.3f} < {loglstar:.3f} "
                    f"< {logl_max:.3f}")
    else:
        bits.append(f"loglstar: {loglstar:.3f}")
    bits.append(f"logz: {logz:.3f} +/- {logzerr:.3f}")
    if dlogz is not None:
        bits.append(f"dlogz: {delta_logz:.3f} > {dlogz:.3f}")
    if stop_val is not None:
        bits.append(f"stop: {stop_val:.3f}")
    return " | ".join(bits)


class EtaEstimator:
    """Remaining-iteration estimate for progress display (reference
    ``utils.py:380-499``).

    Static runs fit a slope to the recent ``ln(delta_logz)`` trend (the
    residual evidence decays geometrically, so the trend is ~linear) and
    extrapolate to the ``dlogz`` target; dynamic batches with a finite
    log-likelihood bracket use the fraction of the bracket crossed."""

    def __init__(self, max_points=10):
        self.history = []  # (niter, ln delta_logz)
        self.times = []  # (time, niter)
        self.max_points = max_points
        self.batch = None
        self.batch_start = None

    def _push(self, store, point):
        if len(store) == 0 or point[0] > store[-1][0]:
            store.append(point)
            if len(store) > self.max_points:
                store.pop(0)

    def remaining_iters(self, niter, delta_logz, dlogz, nbatch=None,
                        loglstar=None, logl_min=-np.inf, logl_max=np.inf):
        """Estimated iterations left, or None when no estimate exists."""
        if (nbatch is not None and loglstar is not None
                and np.isfinite(logl_min) and np.isfinite(logl_max)
                and np.isfinite(loglstar) and logl_max > logl_min):
            if self.batch != nbatch:
                self.batch = nbatch
                self.batch_start = niter
            prog = float(np.clip(
                (loglstar - logl_min) / (logl_max - logl_min), 0.0, 0.999))
            if prog <= 1e-3:
                return None
            done = max(niter - self.batch_start, 1)
            rem = done * (1.0 - prog) / prog
            return int(np.ceil(rem)) if np.isfinite(rem) else None
        if dlogz is None or not np.isfinite(dlogz) or dlogz <= 0:
            return None
        if delta_logz is None or not (np.isfinite(delta_logz)
                                      and delta_logz > dlogz):
            return 0
        self._push(self.history, (niter, np.log(delta_logz)))
        if len(self.history) < 3:
            return None
        pts = np.asarray(self.history, dtype=float)
        if np.allclose(pts[:, 0], pts[0, 0]):
            return None
        slope = np.polyfit(pts[:, 0], pts[:, 1], 1)[0]
        if slope >= 0:
            return None
        rem = (np.log(delta_logz) - np.log(dlogz)) / (-slope)
        return int(np.ceil(rem)) if np.isfinite(rem) else None

    def eta_seconds(self, niter, rem_iters):
        """Wall-clock estimate from the recent iteration rate."""
        self._push(self.times, (time.time(), niter))
        if rem_iters is None or len(self.times) < 2:
            return None
        (t0, n0), (t1, n1) = self.times[0], self.times[-1]
        if n1 <= n0:
            return None
        return rem_iters * (t1 - t0) / (n1 - n0)


def _terminal_width(default=200):
    """Display width for the fallback progress line (reference
    ``utils.py:714-731`` adapts to the terminal)."""
    import shutil

    try:
        return max(shutil.get_terminal_size((default, 20)).columns, 40)
    except Exception:
        return default


class _FallbackPrinter:
    """Carriage-return stderr progress line with a per-run ETA estimator.

    One instance per ``run_nested`` call (created by
    :func:`get_print_func`), so consecutive runs in the same process never
    inherit each other's slope/time history."""

    def __init__(self):
        self.eta = EtaEstimator()

    def __call__(self, results, niter, ncall, add_live_it=None, dlogz=None,
                 stop_val=None, nbatch=None, logl_min=-np.inf,
                 logl_max=np.inf):
        line = _format_status(results, niter, ncall,
                              add_live_it=add_live_it, dlogz=dlogz,
                              stop_val=stop_val, nbatch=nbatch,
                              logl_min=logl_min, logl_max=logl_max)
        rem = self.eta.remaining_iters(niter, results.delta_logz, dlogz,
                                       nbatch=nbatch,
                                       loglstar=results.loglstar,
                                       logl_min=logl_min,
                                       logl_max=logl_max)
        eta = self.eta.eta_seconds(niter, rem)
        if eta is not None and eta > 0:
            m, s = divmod(int(eta), 60)
            h, m = divmod(m, 60)
            line += f" | eta: {h:d}:{m:02d}:{s:02d}" if h else \
                f" | eta: {m:d}:{s:02d}"
        width = _terminal_width() - 1
        sys.stderr.write("\r" + line[:width].ljust(min(width, 120)))
        sys.stderr.flush()

    def close(self):
        pass


# three-tier status strings for width-adaptive printing (reference
# ``utils.py:376-378, 575-651``): long has every field, short compresses
# the numeric formats, mid is short plus the stopping-criterion tail
PrintFnArgs = namedtuple("PrintFnArgs",
                         ["niter", "short_str", "mid_str", "long_str"])


def get_print_fn_args(itresult, niter, ncall, add_live_it=None, dlogz=None,
                      stop_val=None, nbatch=None, logl_min=-np.inf,
                      logl_max=np.inf):
    """Preformatted status-string tiers from one iterator record
    (:class:`IteratorResult` or :class:`IteratorResultShort`); reference
    ``utils.py:575-651``."""
    loglstar = itresult.loglstar if itresult.loglstar > -1e6 else -np.inf
    logz = itresult.logz if itresult.logz > -1e6 else -np.inf
    # above 1e6 the margin is effectively unconverged: print inf
    # (reference ``utils.py:598``)
    delta_logz = itresult.delta_logz if itresult.delta_logz <= 1e6 \
        else np.inf
    logzvar = itresult.logzvar
    logzerr = np.sqrt(logzvar) if 0.0 <= logzvar <= 1e6 else np.nan

    prefix = [] if add_live_it is None else [f"+{add_live_it:d}"]
    long_str = list(prefix)
    short_str = list(prefix)
    if nbatch is not None:
        long_str.append(f"batch: {nbatch:d}")
    long_str += [f"bound: {itresult.bounditer:d}", f"nc: {itresult.nc:d}",
                 f"ncall: {ncall:d}"]
    eff = f"eff(%): {itresult.eff:6.3f}"
    long_str.append(eff)
    short_str.append(eff)

    bracket = np.isfinite(logl_min) or np.isfinite(logl_max)
    if bracket:
        lo = f"{logl_min:6.3f} < " if np.isfinite(logl_min) else ""
        hi = f" < {logl_max:6.3f}" if np.isfinite(logl_max) else ""
        long_str.append(f"loglstar: {lo}{loglstar:6.3f}{hi}")
        lo = f"{logl_min:6.1f}<" if np.isfinite(logl_min) else ""
        hi = f"<{logl_max:6.1f}" if np.isfinite(logl_max) else ""
        short_str.append(f"logl*: {lo}{loglstar:6.1f}{hi}")
    else:
        long_str.append(f"loglstar: {loglstar:6.3f}")
        short_str.append(f"logl*: {loglstar:6.1f}")

    err_l = "" if np.isnan(logzerr) else f" +/- {logzerr:6.3f}"
    err_s = "" if np.isnan(logzerr) else f"+/-{logzerr:.1f}"
    long_str.append(f"logz: {logz:6.3f}{err_l}")
    short_str.append(f"logz: {logz:6.1f}{err_s}")

    # dynamic batches (nbatch > 0 with a stop value) report the stopping
    # diagnostic instead of the base run's dlogz margin
    if dlogz is not None and (nbatch in (None, 0) or stop_val is None):
        long_str.append(f"dlogz: {delta_logz:6.3f} > {dlogz:6.3f}")
        mid_str = short_str + [f"dlogz: {delta_logz:6.1f}>{dlogz:6.1f}"]
    else:
        tail = f"stop: {stop_val:6.3f}"
        long_str.append(tail)
        mid_str = short_str + [tail]

    return PrintFnArgs(niter=niter, short_str=short_str, mid_str=mid_str,
                       long_str=long_str)


def print_fn_fallback(itresult, niter, ncall, add_live_it=None, dlogz=None,
                      stop_val=None, nbatch=None, logl_min=-np.inf,
                      logl_max=np.inf):
    """Carriage-return stderr status line, dropping to the mid/short
    tiers when the terminal is too narrow for the long one (reference
    ``utils.py:689-731``)."""
    args = get_print_fn_args(itresult, niter, ncall,
                             add_live_it=add_live_it, dlogz=dlogz,
                             stop_val=stop_val, nbatch=nbatch,
                             logl_min=logl_min, logl_max=logl_max)
    # only the long tier carries the iteration prefix (reference
    # ``utils.py:714``; mid/short rely on the caller's counter)
    tiers = [" | ".join([f"iter: {args.niter:d}"] + args.long_str),
             " | ".join(args.mid_str),
             "|".join(args.short_str)]
    width = _terminal_width() - 1
    line = next((t for t in tiers if len(t) <= width), tiers[-1][:width])
    sys.stderr.write("\r" + line.ljust(min(width, 120)))
    sys.stderr.flush()


def print_fn_tqdm(pbar, itresult, niter, ncall, add_live_it=None,
                  dlogz=None, stop_val=None, nbatch=None, logl_min=-np.inf,
                  logl_max=np.inf):
    """Status printing through a tqdm progress bar (reference
    ``utils.py:654-686``)."""
    args = get_print_fn_args(itresult, niter, ncall,
                             add_live_it=add_live_it, dlogz=dlogz,
                             stop_val=stop_val, nbatch=nbatch,
                             logl_min=logl_min, logl_max=logl_max)
    pbar.set_postfix_str(" | ".join(args.long_str), refresh=False)
    pbar.update(args.niter - pbar.n)


def print_fn(results, niter, ncall, add_live_it=None, dlogz=None,
             stop_val=None, nbatch=None, logl_min=-np.inf,
             logl_max=np.inf, pbar=None):
    """Stateless default progress printer for users passing
    ``print_func=`` directly (reference ``utils.py:502-572``): tqdm when
    a ``pbar`` is supplied, width-adaptive stderr line otherwise.  The
    default internal path instead uses a per-run printer with an ETA
    estimate (:func:`get_print_func`).  The signature (``pbar`` last)
    matches the reference calling convention."""
    kwargs = dict(add_live_it=add_live_it, dlogz=dlogz, stop_val=stop_val,
                  nbatch=nbatch, logl_min=logl_min, logl_max=logl_max)
    if pbar is not None:
        print_fn_tqdm(pbar, results, niter, ncall, **kwargs)
    else:
        print_fn_fallback(results, niter, ncall, **kwargs)


class _TqdmPrinter:
    """Progress line through a tqdm bar (iteration counter + postfix
    status), mirroring the reference's tqdm integration: ``pbar.total``
    is continuously re-estimated so tqdm shows its native ETA
    (reference ``utils.py:408-499``)."""

    def __init__(self):
        from tqdm import tqdm

        self.pbar = tqdm(total=None, unit="it", leave=True)
        self.eta = EtaEstimator()

    def __call__(self, results, niter, ncall, **kwargs):
        line = _format_status(results, niter, ncall, **kwargs)
        # strip the leading iter field; tqdm shows its own counter
        self.pbar.set_postfix_str(line.split("| ", 1)[-1], refresh=False)
        rem = self.eta.remaining_iters(
            niter, results.delta_logz, kwargs.get("dlogz"),
            nbatch=kwargs.get("nbatch"), loglstar=results.loglstar,
            logl_min=kwargs.get("logl_min", -np.inf),
            logl_max=kwargs.get("logl_max", np.inf))
        if rem is not None and rem > 0:
            self.pbar.total = max(niter + rem, self.pbar.n + 1)
        else:
            self.pbar.total = None
        self.pbar.update(niter - self.pbar.n)

    def close(self):
        self.pbar.close()


def get_print_func(print_func, print_progress):
    """Resolve the progress printer; returns (pbar, print_func).  With
    tqdm available a live progress bar is used; otherwise a carriage-
    return stderr line."""
    if not print_progress:
        return None, (lambda *a, **kw: None)
    if print_func is not None:
        return None, print_func
    try:
        printer = _TqdmPrinter()
        return printer, printer
    except ImportError:
        printer = _FallbackPrinter()
        return None, printer
