"""JAX-traceable prior transforms: map u in [0, 1) to parameter space.

Same family as the reference's example ``priors.py`` (TopHat, Normal,
ClippedNormal, LogNormal, LogUniform, Beta), built on
``jax.scipy.special.ndtri`` and friends so they can run inside jitted
proposal rounds.  Compose per-dimension priors with
:class:`PriorTransform`.
"""

import jax.numpy as jnp
from jax.scipy.special import ndtri, betainc  # noqa: F401

__all__ = [
    "Prior", "TopHat", "Normal", "ClippedNormal", "LogNormal",
    "LogUniform", "Beta", "PriorTransform",
]


class Prior:
    """Base class: a 1-D transform u -> x."""

    def __call__(self, u):
        raise NotImplementedError


class TopHat(Prior):
    """Uniform on [low, high]."""

    def __init__(self, low, high):
        self.low, self.high = low, high

    def __call__(self, u):
        return self.low + (self.high - self.low) * u


class Normal(Prior):
    """Gaussian with the given mean and standard deviation."""

    def __init__(self, mean=0.0, std=1.0):
        self.mean, self.std = mean, std

    def __call__(self, u):
        return self.mean + self.std * ndtri(u)


class ClippedNormal(Prior):
    """Gaussian truncated to [low, high]."""

    def __init__(self, mean=0.0, std=1.0, low=-jnp.inf, high=jnp.inf):
        from jax.scipy.stats.norm import cdf

        self.mean, self.std = mean, std
        self.cdf_low = cdf((low - mean) / std)
        self.cdf_high = cdf((high - mean) / std)

    def __call__(self, u):
        scaled = self.cdf_low + (self.cdf_high - self.cdf_low) * u
        return self.mean + self.std * ndtri(scaled)


class LogNormal(Prior):
    """exp of a Normal(mean, std) variate."""

    def __init__(self, mean=0.0, std=1.0):
        self.mean, self.std = mean, std

    def __call__(self, u):
        return jnp.exp(self.mean + self.std * ndtri(u))


class LogUniform(Prior):
    """log-uniform (Jeffreys) on [low, high], low > 0."""

    def __init__(self, low, high):
        self.log_low = jnp.log(low)
        self.log_high = jnp.log(high)

    def __call__(self, u):
        return jnp.exp(self.log_low +
                       (self.log_high - self.log_low) * u)


class Beta(Prior):
    """Beta(alpha, beta) via bisection inversion of the regularized
    incomplete beta function (traceable, fixed iteration count)."""

    def __init__(self, alpha, beta, niter=50):
        self.alpha, self.beta = alpha, beta
        self.niter = niter

    def __call__(self, u):
        lo = jnp.zeros_like(u)
        hi = jnp.ones_like(u)
        for _ in range(self.niter):
            mid = 0.5 * (lo + hi)
            below = betainc(self.alpha, self.beta, mid) < u
            lo = jnp.where(below, mid, lo)
            hi = jnp.where(below, hi, mid)
        return 0.5 * (lo + hi)


class PriorTransform:
    """Stack per-dimension priors into a prior_transform callable."""

    def __init__(self, priors):
        self.priors = list(priors)

    def __call__(self, u):
        return jnp.stack([p(u[i]) for i, p in enumerate(self.priors)])
