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
