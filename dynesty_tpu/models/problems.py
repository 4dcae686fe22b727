"""Analytic benchmark problems with known log-evidences.

Each problem exposes JAX-traceable ``loglike(x)`` / ``ptform(u)``
callables plus ``ndim`` and (where known) ``logz_truth``.  These are the
targets used throughout the reference's docs and tests (``test_gau.py``,
``test_egg.py``, Gaussian-shells / Rosenbrock demo notebooks, the
wedding-cake plateau likelihood of Fowlie et al. 2020).
"""

import numpy as np
import jax.numpy as jnp

__all__ = [
    "CorrelatedGaussian", "Eggbox", "GaussianShells", "Rosenbrock",
    "WeddingCake", "LogGamma",
]


class _Problem:
    ndim = None
    logz_truth = None

    def loglike(self, x):
        raise NotImplementedError

    def ptform(self, u):
        raise NotImplementedError


class CorrelatedGaussian(_Problem):
    """ndim-D Gaussian with uniform correlation ``corr`` on a
    [-prior_win, prior_win]^ndim top-hat prior."""

    def __init__(self, ndim=3, corr=0.95, prior_win=10.0,
                 dtype=np.float32):
        self.ndim = ndim
        self.prior_win = prior_win
        cov = np.identity(ndim)
        cov[cov == 0] = corr
        self._cinv = jnp.asarray(np.linalg.inv(cov).astype(dtype))
        self._lnorm = float(-0.5 * (np.log(2 * np.pi) * ndim +
                                    np.log(np.linalg.det(cov))))
        self.logz_truth = -ndim * np.log(2 * prior_win)

    def loglike(self, x):
        return -0.5 * jnp.dot(x, self._cinv @ x) + self._lnorm

    def ptform(self, u):
        return self.prior_win * (2.0 * u - 1.0)


class Eggbox(_Problem):
    """2-D multimodal eggbox (logz ~ 235.856)."""

    ndim = 2
    logz_truth = 235.856

    def loglike(self, x):
        tmax = 5.0 * np.pi
        t = 2.0 * tmax * x - tmax
        return (2.0 + jnp.cos(t[0] / 2.0) * jnp.cos(t[1] / 2.0)) ** 5.0

    def ptform(self, u):
        return u


class GaussianShells(_Problem):
    """Two overlapping 2-D Gaussian shells (logz ~ -1.75)."""

    ndim = 2
    logz_truth = -1.75

    def __init__(self, c1=(-3.5, 0.0), c2=(3.5, 0.0), r=2.0, w=0.1,
                 prior_win=6.0):
        self.c1 = jnp.asarray(c1)
        self.c2 = jnp.asarray(c2)
        self.r, self.w = r, w
        self.prior_win = prior_win

    def _shell(self, x, c):
        d = jnp.linalg.norm(x - c)
        return (-((d - self.r) ** 2) / (2.0 * self.w ** 2) -
                jnp.log(jnp.sqrt(2.0 * jnp.pi) * self.w))

    def loglike(self, x):
        return jnp.logaddexp(self._shell(x, self.c1),
                             self._shell(x, self.c2))

    def ptform(self, u):
        return self.prior_win * (2.0 * u - 1.0)


class Rosenbrock(_Problem):
    """ndim-D Rosenbrock density on [-5, 5]^ndim."""

    def __init__(self, ndim=2, a=1.0, b=100.0, prior_win=5.0):
        self.ndim = ndim
        self.a, self.b = a, b
        self.prior_win = prior_win

    def loglike(self, x):
        val = jnp.sum(self.b * (x[1:] - x[:-1] ** 2) ** 2 +
                      (self.a - x[:-1]) ** 2)
        return -val

    def ptform(self, u):
        return self.prior_win * (2.0 * u - 1.0)


class WeddingCake(_Problem):
    """Fowlie et al. (2020) wedding-cake likelihood: an infinite stack of
    plateaus.  Exact evidence via the geometric series."""

    def __init__(self, ndim=2, sig=0.2, alpha=0.7):
        self.ndim = ndim
        self.sig = sig
        self.alpha = alpha
        # exact logz: geometric series over the plateau shells
        D, a, s = ndim, alpha, sig
        i = np.arange(100)
        from scipy.special import logsumexp

        self.logz_truth = float(logsumexp(
            -a ** (2 * i / D) / (8 * s ** 2) + i * np.log(a) +
            np.log(1 - a)))

    def loglike(self, x):
        D, a, s = self.ndim, self.alpha, self.sig
        r = jnp.max(jnp.abs(x - 0.5))
        i = jnp.floor(D * jnp.log(2 * r) / jnp.log(a)).astype(jnp.int32)
        return -(a ** (2.0 * i / D)) / (8.0 * s ** 2)

    def ptform(self, u):
        return u


class LogGamma(_Problem):
    """ndim-D mixture of log-gamma and normal distributions (the classic
    multimodal "LogGamma" test of Beaujean & Caldwell 2013); logz = 0 on
    the unit prior by construction (normalized density)."""

    def __init__(self, ndim=2, prior_win=30.0):
        assert ndim >= 2
        self.ndim = ndim
        self.prior_win = prior_win
        self.logz_truth = -ndim * np.log(2 * prior_win)

    def _log_gamma_pdf(self, x, loc, scale):
        z = (x - loc) / scale
        return z - jnp.exp(z) - jnp.log(scale)

    def _log_norm_pdf(self, x, loc, scale):
        return (-0.5 * ((x - loc) / scale) ** 2 -
                0.5 * jnp.log(2 * jnp.pi * scale ** 2))

    def loglike(self, x):
        ga = jnp.logaddexp(self._log_gamma_pdf(x[0], -10.0, 1.0),
                           self._log_gamma_pdf(x[0], 10.0, 1.0)) - \
            jnp.log(2.0)
        nb = jnp.logaddexp(self._log_norm_pdf(x[1], -10.0, 1.0),
                           self._log_norm_pdf(x[1], 10.0, 1.0)) - \
            jnp.log(2.0)
        rest = 0.0
        for i in range(2, self.ndim):
            if i <= (self.ndim + 2) // 2 - 1:
                rest = rest + self._log_gamma_pdf(x[i], 10.0, 1.0)
            else:
                rest = rest + self._log_norm_pdf(x[i], 10.0, 1.0)
        # density normalized over R^ndim: the evidence is just the
        # uniform-prior volume factor (up to truncation tails)
        return ga + nb + rest

    def ptform(self, u):
        return self.prior_win * (2.0 * u - 1.0)
