"""Host-side utilities: results containers, run algebra, error analysis,
RNG discipline, checkpointing, progress reporting."""

from .results import Results, RunRecord, results_substitute
from .misc import (
    get_random_generator,
    get_seed_sequence,
    get_jax_key,
    mean_and_cov,
    quantile,
    resample_equal,
    DelayTimer,
    IteratorResult,
    IteratorResultShort,
    print_fn,
    print_fn_fallback,
    print_fn_tqdm,
    get_print_fn_args,
    PrintFnArgs,
    get_print_func,
    SQRTEPS,
    SamplerHistoryItem,
)
from .runs import (
    jitter_run,
    resample_run,
    reweight_run,
    unravel_run,
    merge_runs,
    kld_error,
    check_result_static,
)
from .checkpoint import save_sampler, restore_sampler

# reference `dynesty.utils` namespace parity
from ..ops.integrals import (compute_integrals, progress_integration,
                             get_neff_from_logwt, LOWL_VAL)
from ..ops.geometry import unitcheck, apply_reflect, randsphere
from ..internal.likelihood import LogLikelihood, LoglOutput


def get_nonbounded(ndim, periodic, reflective):
    """Boolean mask, True for ordinary dimensions and False for
    periodic/reflective ones; None when neither is given (reference
    ``utils.py:950-976``)."""
    from ..dynesty import _get_nonbounded
    if periodic is None and reflective is None:
        return None
    return _get_nonbounded(ndim, periodic, reflective)

__all__ = [
    "Results",
    "RunRecord",
    "results_substitute",
    "get_random_generator",
    "get_seed_sequence",
    "get_jax_key",
    "mean_and_cov",
    "quantile",
    "resample_equal",
    "DelayTimer",
    "IteratorResult",
    "print_fn",
    "get_print_func",
    "jitter_run",
    "resample_run",
    "reweight_run",
    "unravel_run",
    "merge_runs",
    "kld_error",
    "check_result_static",
    "save_sampler",
    "restore_sampler",
    "compute_integrals",
    "progress_integration",
    "get_neff_from_logwt",
    "LOWL_VAL",
    "unitcheck",
    "apply_reflect",
    "randsphere",
    "LogLikelihood",
    "LoglOutput",
    "get_nonbounded",
]
