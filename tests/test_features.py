"""Feature tests: plateaus, periodic/reflective boundaries, ncdim,
blobs, host-mode likelihood (patterns of the reference
``test_plateau.py``, ``test_periodic.py``, ``test_reflect.py``,
``test_ncdim.py``, ``test_blob.py``, ``test_pool.py``)."""

import numpy as np
import jax.numpy as jnp
import pytest
from scipy.special import erf

import dynesty_tpu as dytpu
from dynesty_tpu.models import WeddingCake

from utils import get_rstate


# --------------------------------------------------------------------------
# plateaus


def test_wedding_cake():
    prob = WeddingCake(ndim=2, sig=0.2, alpha=0.7)
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(prob.loglike, prob.ptform, 2, nlive=300,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=64)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert abs(res.logz[-1] - prob.logz_truth) < 4 * res.logzerr[-1], \
        (res.logz[-1], prob.logz_truth, res.logzerr[-1])


def test_flat_likelihood_shell():
    # constant likelihood inside a ball, -inf outside: logz is the log
    # volume fraction of the ball in the prior cube
    r0 = 0.3

    def loglike(x):
        r = jnp.linalg.norm(x - 0.5)
        return jnp.where(r < r0, 1.0, -jnp.inf)

    def ptform(u):
        return u

    truth = 1.0 + np.log(np.pi * r0 ** 2)  # 2-D ball volume
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, 2, nlive=300,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=64)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    # plateau runs have larger uncertainties; generous gate as in the
    # reference plateau suite
    err = max(res.logzerr[-1], 1e-3)
    assert abs(res.logz[-1] - truth) < 5 * np.sqrt(err ** 2 + 0.01), \
        (res.logz[-1], truth)


def test_inf_edge():
    # half the cube is -inf: logz = log(0.5)
    def loglike(x):
        return jnp.where(x[0] < 0.5, 0.0, -jnp.inf)

    def ptform(u):
        return u

    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, 2, nlive=200,
                                  bound="single", sample="unif",
                                  rstate=rstate, queue_size=32)
    sampler.run_nested(print_progress=False, maxiter=500)
    res = sampler.results
    assert np.isfinite(res.logz[-1])


# --------------------------------------------------------------------------
# periodic / reflective boundaries

_SIG = 0.09


def _wrapped_gau_logl(x):
    # gaussian centered at the cube edge (0/1 seam) in dim 0, center 0.5
    # in dim 1
    d0 = jnp.minimum(jnp.abs(x[0]), 1 - jnp.abs(x[0]))
    d1 = x[1] - 0.5
    return (-0.5 * (d0 ** 2 + d1 ** 2) / _SIG ** 2 -
            jnp.log(2 * jnp.pi * _SIG ** 2))


def _refl_gau_logl(x):
    # gaussian centered at the reflective edge x0=0
    d0 = x[0]
    d1 = x[1] - 0.5
    return (-0.5 * (d0 ** 2 + d1 ** 2) / _SIG ** 2 -
            jnp.log(2 * jnp.pi * _SIG ** 2))


def _ident(u):
    return u


@pytest.mark.parametrize("sample", ["rwalk", "rslice"])
def test_periodic(sample):
    # truth: full gaussian mass in dim 0 (wraps around), half-width erf
    # in dim 1
    truth = np.log(erf(0.5 / np.sqrt(2) / _SIG))
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(_wrapped_gau_logl, _ident, 2, nlive=300,
                                  bound="multi", sample=sample,
                                  periodic=[0], rstate=rstate,
                                  queue_size=64)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert abs(res.logz[-1] - truth) < 6 * res.logzerr[-1], \
        (res.logz[-1], truth, res.logzerr[-1])


@pytest.mark.parametrize("sample", ["rwalk"])
def test_reflective(sample):
    # half gaussian at x0=0 (reflective) times erf-truncated in both dims
    truth = np.log(0.5 * erf(1.0 / np.sqrt(2) / _SIG) *
                   erf(0.5 / np.sqrt(2) / _SIG))
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(_refl_gau_logl, _ident, 2, nlive=300,
                                  bound="multi", sample=sample,
                                  reflective=[0], rstate=rstate,
                                  queue_size=64)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert abs(res.logz[-1] - truth) < 6 * res.logzerr[-1], \
        (res.logz[-1], truth, res.logzerr[-1])


# --------------------------------------------------------------------------
# ncdim (clustered dimensions)


def test_ncdim():
    # first 2 dims informative, last 2 flat: sample only the first 2 with
    # the kernel
    ndim, ncdim = 4, 2

    def loglike(x):
        return -0.5 * jnp.sum((x[:2] / 0.1) ** 2) - \
            np.log(2 * np.pi * 0.1 ** 2)

    def ptform(u):
        return 2.0 * u - 1.0

    truth = -ncdim * np.log(2.0)
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, ndim, nlive=250,
                                  bound="multi", sample="rwalk",
                                  ncdim=ncdim, rstate=rstate,
                                  queue_size=64)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert abs(res.logz[-1] - truth) < 5 * res.logzerr[-1], \
        (res.logz[-1], truth, res.logzerr[-1])
    # flat dims stay uniform
    eq = res.samples_equal(rstate=rstate)
    assert abs(eq[:, 3].mean()) < 0.15


# --------------------------------------------------------------------------
# blobs


def test_blob():
    def loglike(x):
        logl = -0.5 * jnp.sum((x / 0.5) ** 2)
        blob = jnp.stack([logl, x[0]])
        return logl, blob

    def ptform(u):
        return 2.0 * u - 1.0

    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, 2, nlive=150,
                                  bound="single", sample="unif",
                                  blob=True, rstate=rstate, queue_size=32)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    blobs = np.array([b for b in res.blob])
    assert blobs.shape == (len(res.logl), 2)
    # blob[0] must equal the stored logl of each sample
    assert np.allclose(blobs[:, 0], res.logl, atol=1e-5)


def test_blob_rwalk():
    def loglike(x):
        logl = -0.5 * jnp.sum((x / 0.5) ** 2)
        return logl, logl * 2.0

    def ptform(u):
        return 2.0 * u - 1.0

    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, 2, nlive=150,
                                  bound="single", sample="rwalk",
                                  blob=True, rstate=rstate, queue_size=32)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    blobs = np.array([b for b in res.blob], dtype=np.float64)
    assert np.allclose(blobs, 2 * np.asarray(res.logl), atol=1e-4)


# --------------------------------------------------------------------------
# host-mode likelihood (arbitrary Python callables)


def _np_loglike(x):
    return -0.5 * np.sum((x / 0.5) ** 2)


def _np_ptform(u):
    return 2.0 * u - 1.0


def test_host_mode():
    truth = (0.5 * np.log(2 * np.pi * 0.25) * 2 -
             np.log(4.0))  # N(0, 0.5^2) over [-1,1]^2
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(_np_loglike, _np_ptform, 2, nlive=150,
                                  bound="single", sample="unif",
                                  likelihood_mode="host", rstate=rstate,
                                  queue_size=32)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    # compare against the same problem in jax mode
    rstate = get_rstate()
    sampler2 = dytpu.NestedSampler(
        lambda x: -0.5 * jnp.sum((x / 0.5) ** 2),
        lambda u: 2.0 * u - 1.0, 2, nlive=150, bound="single",
        sample="unif", rstate=rstate, queue_size=32)
    sampler2.run_nested(print_progress=False)
    res2 = sampler2.results
    assert abs(res.logz[-1] - res2.logz[-1]) < \
        4 * np.hypot(res.logzerr[-1], res2.logzerr[-1])


def test_host_mode_rwalk():
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(_np_loglike, _np_ptform, 2, nlive=100,
                                  bound="single", sample="rwalk",
                                  likelihood_mode="host", rstate=rstate,
                                  queue_size=16)
    sampler.run_nested(print_progress=False, maxiter=300)
    assert np.isfinite(sampler.results.logz[-1])


def test_vectorized_likelihood_mode():
    """likelihood_mode='vectorized': the user callables already take
    (N, ndim) batches."""
    cov = np.identity(3)
    cov[cov == 0] = 0.95
    cinv = np.linalg.inv(cov)
    lnorm = -0.5 * (np.log(2 * np.pi) * 3 + np.log(np.linalg.det(cov)))

    def loglike(x):  # (N, ndim) -> (N,)
        return -0.5 * jnp.einsum("ni,ij,nj->n", x, jnp.asarray(cinv),
                                 x) + lnorm

    def ptform(u):  # (N, ndim) -> (N, ndim)
        return 10.0 * (2.0 * u - 1.0)

    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, 3, nlive=150,
                                  bound="single", sample="unif",
                                  likelihood_mode="vectorized",
                                  rstate=rstate, queue_size=64)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    truth = 3 * (-np.log(20.0))
    assert abs(res.logz[-1] - truth) < 4 * res.logzerr[-1]
