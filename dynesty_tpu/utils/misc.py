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
    "IteratorResult", "print_fn", "get_print_func",
]

IteratorResult = namedtuple("IteratorResult", [
    "worst", "ustar", "vstar", "loglstar", "logvol", "logwt", "logz",
    "logzvar", "h", "nc", "blob", "worst_it", "boundidx", "bounditer",
    "eff", "delta_logz", "proposal_stats"
])

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
    (_, _, _, loglstar, logvol, logwt, logz, logzvar, h, nc, _, _, _,
     _, eff, delta_logz, _) = results
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


def print_fn(results, niter, ncall, add_live_it=None, dlogz=None,
             stop_val=None, nbatch=None, logl_min=-np.inf, logl_max=np.inf):
    """Default progress line printed to stderr (carriage-return style)."""
    line = _format_status(results, niter, ncall, add_live_it=add_live_it,
                          dlogz=dlogz, stop_val=stop_val, nbatch=nbatch,
                          logl_min=logl_min, logl_max=logl_max)
    sys.stderr.write("\r" + line[:200].ljust(120))
    sys.stderr.flush()


class _TqdmPrinter:
    """Progress line through a tqdm bar (iteration counter + postfix
    status), mirroring the reference's tqdm integration."""

    def __init__(self):
        from tqdm import tqdm

        self.pbar = tqdm(total=None, unit="it", leave=True)

    def __call__(self, results, niter, ncall, **kwargs):
        line = _format_status(results, niter, ncall, **kwargs)
        # strip the leading iter field; tqdm shows its own counter
        self.pbar.set_postfix_str(line.split("| ", 1)[-1], refresh=False)
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
        return None, print_fn
