"""Thin vs general consume-scan equivalence.

The fused batch-mode round has two consume implementations selected at
runtime by ``lax.cond`` (``internal/fused.py``): the general
O(nlive)-carry scan (reference semantics: ``sampler.py:1070-1212``) and
a thin scalar-carry fast path valid whenever the q-th-order-statistic
threshold is strict (``cand < lmax``).  These runs must be bit-identical
end to end — the thin path is an algebraic collapse, not an
approximation.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu
import dynesty_tpu.internal.fused as fused_mod
import dynesty_tpu.internal.samplers as smod

from utils import get_rstate

NDIM = 3


def _gau():
    cov = np.identity(NDIM)
    cov[cov == 0] = 0.95
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * NDIM +
                    np.log(np.linalg.det(cov)))

    def loglike(x):
        return -0.5 * jnp.dot(x, jnp.asarray(cinv) @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    return loglike, ptform


def _run(kernel, seed=56):
    loglike, ptform = _gau()
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=60,
                            bound="single", sample=kernel,
                            queue_size=16, rstate=get_rstate(seed))
    s.run_nested(dlogz=1.0, print_progress=False)
    return s.results


@pytest.mark.parametrize("kernel", ["rslice", "unif"])
def test_thin_general_bit_identical(kernel, monkeypatch):
    res_thin = _run(kernel)
    # rebuild every fused trace with the fast path compiled out
    smod._GLOBAL_ROUND_CACHE.clear()
    monkeypatch.setattr(fused_mod, "_FORCE_GENERAL_CONSUME", True)
    try:
        res_gen = _run(kernel)
    finally:
        smod._GLOBAL_ROUND_CACHE.clear()

    for key in ("logz", "logzerr", "logl", "logvol", "logwt", "ncall",
                "samples", "samples_it", "samples_id", "samples_u",
                "samples_n", "samples_birth"):
        a, b = res_thin[key], res_gen[key]
        assert np.array_equal(np.asarray(a), np.asarray(b)), \
            f"{kernel}: results field {key!r} differs between the thin " \
            f"and general consume paths"
    assert res_thin.niter == res_gen.niter
