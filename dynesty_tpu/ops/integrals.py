"""Evidence integration: the quadratic (trapezoid) nested-sampling estimator.

Semantics follow the reference estimator (``utils.py:1411-1492`` of the
reference repo, "eqn 16 of Speagle 2020"): given a sequence of dead points
with log-likelihoods ``logl_i`` and associated log prior volumes
``logvol_i`` (decreasing, with the implicit start ``logvol_{-1} = 0`` and
``logl_{-1} = LOWL_VAL``), the weight of sample ``i`` is

    wt_i = (L_i + L_{i-1}) / 2 * (X_{i-1} - X_i)

accumulated in log space, together with the information ``H`` and the
variance estimate ``var[ln Z] = |sum dH * dlnX|``.

All host arithmetic is float64 numpy.  ``progress_integration_jax`` is the
scalar one-step update usable inside a jitted ``lax.scan`` shell.
"""

import math

import numpy as np
import jax.numpy as jnp

__all__ = [
    "LOWL_VAL",
    "compute_integrals",
    "progress_integration",
    "progress_integration_jax",
    "get_neff_from_logwt",
]

# Sentinel for "log-likelihood is effectively -inf".  A large-but-finite
# value is used instead of -inf so that expressions of the form
# exp(logl - norm) * logl evaluate to 0.0 rather than nan (0 * -inf).
# Matches the reference sentinel (utils.py:54).
LOWL_VAL = -1e300

_LN_HALF = math.log(0.5)


def compute_integrals(*, logl, logvol, reweight=None):
    """Compute log-weights, cumulative log-evidence, its variance and the
    information from arrays of dead-point ``logl`` and ``logvol``.

    Parameters
    ----------
    logl : array (n,)
        Log-likelihoods of dead points, in sampling order.
    logvol : array (n,)
        Log prior volumes associated with each dead point (decreasing).
    reweight : array (n,), optional
        Additive log-reweighting applied to the weights.

    Returns
    -------
    logwt, logz, logzvar, h : arrays (n,)
    """
    logl = np.asarray(logl, dtype=np.float64)
    logvol = np.asarray(logvol, dtype=np.float64)

    # Trapezoid pairs (L_{i-1}, L_i); L_{-1} = 0 in linear space.
    lpad = np.concatenate([[LOWL_VAL], logl])

    # dlv_i = logvol_i - logvol_{i-1} <= 0 ; the log of the shell width is
    # log(X_{i-1} - X_i) = logvol_{i-1} + log(1 - exp(dlv_i)).
    dlv = np.diff(logvol, prepend=0.0)
    with np.errstate(divide="ignore", invalid="ignore"):
        log_shell = (logvol - dlv) + np.log1p(-np.exp(dlv))
    # Zero-width shells (dlv == 0) give log_shell = -inf: weightless.
    log_shell = np.where(dlv == 0, -np.inf, log_shell)
    log_half_shell = log_shell + _LN_HALF

    logwt = np.logaddexp(lpad[1:], lpad[:-1]) + log_half_shell
    if reweight is not None:
        logwt = logwt + np.asarray(reweight, dtype=np.float64)

    logz = np.logaddexp.accumulate(logwt)
    logz_max = logz[-1]

    # Information H = int (L/Z) ln L dX - (Z_x / Z) ln Z, accumulated with
    # likelihoods normalized by exp(logz_max) to avoid overflow.
    with np.errstate(invalid="ignore"):
        h_terms = (np.exp(lpad[1:] - logz_max + log_half_shell) * lpad[1:] +
                   np.exp(lpad[:-1] - logz_max + log_half_shell) * lpad[:-1])
    h_terms = np.nan_to_num(h_terms, nan=0.0)
    h = np.cumsum(h_terms) - logz_max * np.exp(logz - logz_max)

    dh = np.diff(h, prepend=0.0)
    logzvar = np.abs(np.cumsum(dh * (-dlv)))
    return logwt, logz, logzvar, h


def progress_integration(loglstar, loglstar_new, logz, logzvar, logvol,
                         dlogvol, h):
    """One streaming step of the trapezoid evidence estimator.

    ``logvol`` is the (already decremented) log-volume of the current dead
    point and ``dlogvol > 0`` the log-shrinkage applied this iteration, so
    the previous volume is ``logvol + dlogvol``.  Matches the reference
    one-step update (``utils.py:1470-1492``), including its slightly
    different (streaming) H accumulation.

    Returns ``(logwt, logz_new, logzvar_new, h_new)``.
    """
    # log(0.5 * (X_prev - X_cur)); X_prev = exp(logvol + dlogvol) > X_cur.
    log_half_shell = (logvol + dlogvol + _LN_HALF +
                      math.log1p(-math.exp(-dlogvol)))
    logwt = np.logaddexp(loglstar_new, loglstar) + log_half_shell
    logz_new = np.logaddexp(logz, logwt)
    lzterm = (math.exp(loglstar - logz_new + log_half_shell) * loglstar +
              math.exp(loglstar_new - logz_new + log_half_shell) *
              loglstar_new)
    h_new = lzterm + math.exp(logz - logz_new) * (h + logz) - logz_new
    logzvar_new = logzvar + (h_new - h) * dlogvol
    return logwt, logz_new, logzvar_new, h_new


def progress_integration_jax(loglstar, loglstar_new, logz, logzvar, logvol,
                             dlogvol, h):
    """jnp scalar version of :func:`progress_integration` for use inside
    jitted scan shells.  All inputs/outputs are float64 scalars (enable
    x64 for the integrator carry)."""
    log_half_shell = (logvol + dlogvol + _LN_HALF +
                      jnp.log1p(-jnp.exp(-dlogvol)))
    logwt = jnp.logaddexp(loglstar_new, loglstar) + log_half_shell
    logz_new = jnp.logaddexp(logz, logwt)
    lzterm = (jnp.exp(loglstar - logz_new + log_half_shell) * loglstar +
              jnp.exp(loglstar_new - logz_new + log_half_shell) *
              loglstar_new)
    h_new = lzterm + jnp.exp(logz - logz_new) * (h + logz) - logz_new
    logzvar_new = logzvar + (h_new - h) * dlogvol
    return logwt, logz_new, logzvar_new, h_new


def get_neff_from_logwt(logwt):
    """Kish effective sample size from unnormalized log-weights
    (reference ``utils.py:1012-1033``)."""
    logwt = np.asarray(logwt, dtype=np.float64)
    w = np.exp(logwt - logwt.max())
    return w.sum() ** 2 / (w ** 2).sum()
