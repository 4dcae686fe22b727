"""Built-in prior transforms and analytic benchmark problems.

``priors`` mirrors the reference's example prior classes
(``priors.py:1-60`` at the reference repo root) as JAX-traceable
transforms; ``problems`` packages the analytic likelihoods used across
the reference's docs/tests (correlated Gaussian, eggbox, Gaussian
shells, Rosenbrock, wedding cake) with their known log-evidences.
"""

from .priors import (Prior, TopHat, Normal, ClippedNormal, LogNormal,
                     LogUniform, Beta, PriorTransform)
from .problems import (CorrelatedGaussian, Eggbox, GaussianShells,
                       Rosenbrock, WeddingCake, LogGamma)

__all__ = [
    "Prior", "TopHat", "Normal", "ClippedNormal", "LogNormal",
    "LogUniform", "Beta", "PriorTransform",
    "CorrelatedGaussian", "Eggbox", "GaussianShells", "Rosenbrock",
    "WeddingCake", "LogGamma",
]
