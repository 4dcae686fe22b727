"""Numeric substrate: evidence integrals, geometry primitives, RNG fan-out.

Host-side (numpy, float64) versions carry the exact sequential evidence
bookkeeping; device-side (jnp) versions are used inside jitted proposal
rounds.  Semantics follow the reference implementation
(``/root/reference/py/dynesty/utils.py``, ``bounding.py``) but all code here
is written fresh for a batch-first layout.
"""

from .integrals import (
    LOWL_VAL,
    compute_integrals,
    progress_integration,
    progress_integration_jax,
    get_neff_from_logwt,
)
from .geometry import (
    unitcheck,
    unitcheck_batch,
    apply_reflect,
    apply_reflect_jax,
    randsphere,
    randsphere_batch,
    logvol_prefactor,
    rand_choice,
    mle_cov,
    improve_covar_mat,
)

__all__ = [
    "LOWL_VAL",
    "compute_integrals",
    "progress_integration",
    "progress_integration_jax",
    "get_neff_from_logwt",
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
