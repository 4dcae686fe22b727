"""Geometry primitives: unit-cube checks, reflections, sphere sampling,
covariance estimation and conditioning.

Host (numpy) versions are used by the bound-fitting code; batched jnp
versions (suffix ``_batch`` / ``_jax``) run inside jitted proposal rounds.
Semantics follow the reference (``utils.py:1036-1079``,
``bounding.py:1271-1384``) with batch-first layouts.
"""

import math

import numpy as np
import jax
import jax.numpy as jnp

__all__ = [
    "unitcheck",
    "unitcheck_batch",
    "apply_reflect",
    "apply_reflect_jax",
    "randsphere",
    "randsphere_batch",
    "logvol_prefactor",
    "rand_choice",
    "mle_cov",
    "improve_covar_mat",
]


# --------------------------------------------------------------------------
# unit-cube membership


def unitcheck(u, nonbounded=None):
    """Host check that point ``u`` lies in the unit cube; dimensions marked
    False in ``nonbounded`` (i.e. periodic ones) may roam in (-0.5, 1.5)."""
    u = np.asarray(u)
    if nonbounded is None:
        return bool(u.min() > 0 and u.max() < 1)
    nonbounded = np.asarray(nonbounded, dtype=bool)
    strict = u[nonbounded]
    loose = u[~nonbounded]
    ok = True
    if strict.size:
        ok &= bool(strict.min() > 0 and strict.max() < 1)
    if loose.size:
        ok &= bool(loose.min() > -0.5 and loose.max() < 1.5)
    return ok


def unitcheck_batch(u, nonbounded=None):
    """Device check for a batch ``u`` of shape (..., ndim); returns a bool
    array of shape (...).  ``nonbounded`` is a static bool vector (ndim,)
    or None."""
    if nonbounded is None:
        return jnp.all((u > 0) & (u < 1), axis=-1)
    nb = jnp.asarray(nonbounded, dtype=bool)
    lo = jnp.where(nb, 0.0, -0.5)
    hi = jnp.where(nb, 1.0, 1.5)
    return jnp.all((u > lo) & (u < hi), axis=-1)


# --------------------------------------------------------------------------
# reflective boundaries


def apply_reflect(u):
    """Map values to [0, 1] by repeated reflection at both edges
    (host, copies its input). 2n + x and 2n - x both map to x."""
    u = np.array(u, dtype=np.float64, copy=True)
    even = np.mod(u, 2) < 1
    u[even] = np.mod(u[even], 1)
    u[~even] = 1 - np.mod(u[~even], 1)
    return u


def apply_reflect_jax(u):
    """Device version of :func:`apply_reflect` (elementwise, any shape)."""
    m2 = jnp.mod(u, 2.0)
    return jnp.where(m2 < 1.0, m2, 2.0 - m2)


# --------------------------------------------------------------------------
# sphere sampling


def randsphere(n, rstate):
    """Host: one point uniform in the n-ball (Gaussian direction times a
    U^{1/n} radius)."""
    z = rstate.standard_normal(size=n)
    r = rstate.random() ** (1.0 / n)
    return z * (r / np.linalg.norm(z))


def randsphere_batch(key, shape_prefix, n, dtype=jnp.float64):
    """Device: batch of points uniform in the n-ball; returns array of
    shape ``shape_prefix + (n,)``."""
    kz, kr = jax.random.split(key)
    z = jax.random.normal(kz, shape_prefix + (n,), dtype=dtype)
    r = jax.random.uniform(kr, shape_prefix + (1,), dtype=dtype) ** (1.0 / n)
    norm = jnp.linalg.norm(z, axis=-1, keepdims=True)
    return z * (r / jnp.maximum(norm, jnp.finfo(dtype).tiny))


# --------------------------------------------------------------------------
# misc host helpers


def logvol_prefactor(n, p=2.0):
    """ln(volume constant) of the n-dim unit L^p ball:
    n ln 2 + n lnGamma(1/p + 1) - lnGamma(n/p + 1)."""
    p = float(p)
    return (n * math.log(2.0) + n * math.lgamma(1.0 / p + 1.0) -
            math.lgamma(n / p + 1.0))


def rand_choice(probs, rstate):
    """Host: index drawn with probabilities ``probs`` (must sum to ~1)."""
    cum = np.cumsum(probs)
    return min(int(np.searchsorted(cum, rstate.random())), len(probs) - 1)


def mle_cov(points):
    """Maximum-likelihood (1/N) covariance of points (npoints, ndim)."""
    points = np.asarray(points, dtype=np.float64)
    delta = points - points.mean(axis=0)
    return delta.T @ delta / len(points)


# --------------------------------------------------------------------------
# covariance conditioning


def improve_covar_mat(covar0, ntries=100, max_condition_number=1e12):
    """Repair a covariance matrix that is singular, non-finite, or too
    ill-conditioned, mirroring the reference self-healing logic
    (``bounding.py:1311-1384``).

    Returns ``(good, covar, am, axes, (eigval, eigvec))`` where ``good``
    means no repair was needed, ``am`` is the precision matrix, ``axes``
    the principal-axis transform (columns scaled eigenvectors), and the
    final tuple is the eigendecomposition of the returned ``covar`` so
    callers can avoid a redundant ``eigh``.
    """
    ndim = covar0.shape[0]
    covar = np.array(covar0, dtype=np.float64)
    coeff_min = 1e-10
    eig_margin = 10.0  # keep condition number safely below the max

    eigval = eigvec = axes = None
    failed = 0
    for trial in range(ntries):
        failed = 0
        try:
            eigval, eigvec = np.linalg.eigh(covar)
            if np.isfinite(eigval).all():
                vmax, vmin = eigval.max(), eigval.min()
                if vmax <= 0:
                    failed = 2  # nothing positive to work with
                elif vmin < vmax / max_condition_number:
                    failed = 1  # floor the small eigenvalues
                else:
                    axes = eigvec * np.sqrt(eigval)
                    break
            else:
                failed = 2
        except np.linalg.LinAlgError:
            failed = 2
        if failed == 1:
            floor = eig_margin * eigval.max() / max_condition_number
            fixed = np.maximum(eigval, floor)
            covar = (eigvec * fixed) @ eigvec.T
        elif failed == 2:
            # blend toward the identity, geometrically ramping the weight
            coeff = coeff_min * (1.0 / coeff_min) ** (trial / (ntries - 1))
            covar = (1.0 - coeff) * covar + coeff * np.eye(ndim)

    if failed > 0:
        import warnings

        warnings.warn("Could not condition the ellipsoid covariance; "
                      "falling back to a unit sphere.")
        covar = np.eye(ndim)
        return (False, covar, covar.copy(), covar.copy(),
                (np.ones(ndim), np.eye(ndim)))

    am = (eigvec * (1.0 / eigval)) @ eigvec.T
    return trial == 0, covar, am, axes, (eigval, eigvec)
