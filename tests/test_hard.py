"""Harder analytic problems: Gaussian shells, high-dim Gaussians,
Rosenbrock posterior, the 1/|x| pathology (reference ``test_highdim.py``,
``test_rosenbrock.py``, ``test_pathology.py`` patterns; heavy cases are
marked slow)."""

import numpy as np
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu
from dynesty_tpu.models import GaussianShells, Rosenbrock

from utils import get_rstate


def test_gaussian_shells():
    prob = GaussianShells()
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                  nlive=500, bound="multi", sample="unif",
                                  rstate=rstate, queue_size=128)
    sampler.run_nested(print_progress=False, dlogz=0.01)
    res = sampler.results
    assert abs(res.logz[-1] - prob.logz_truth) < 5 * res.logzerr[-1], \
        (res.logz[-1], res.logzerr[-1])
    # bimodal posterior: both shells populated
    eq = res.samples_equal(rstate=rstate)
    assert (eq[:, 0] < 0).mean() > 0.2
    assert (eq[:, 0] > 0).mean() > 0.2


def test_pathology():
    # 1/|x0| spike capped at alpha, flat in x1, with a tiny tilt to
    # avoid an exact plateau; logz = log(1 - log(alpha))
    alpha = 1e-8

    def loglike(x):
        logl = -jnp.log(jnp.maximum(jnp.abs(x[0]), alpha))
        return logl - 1e-8 * jnp.sum(x ** 2)

    def ptform(u):
        return 2.0 * u - 1.0

    truth = np.log(1 - np.log(alpha))
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, 2, nlive=500,
                                  bound="multi", sample="rslice",
                                  rstate=rstate, queue_size=128)
    sampler.run_nested(print_progress=False, dlogz=0.1)
    res = sampler.results
    assert abs(res.logz[-1] - truth) < 4 * res.logzerr[-1], \
        (res.logz[-1], truth, res.logzerr[-1])


@pytest.mark.slow
@pytest.mark.parametrize("ndim", [10, 30])
def test_highdim(ndim):
    # random-covariance Gaussians at large nlive (reference
    # test_highdim.py:129-146)
    rstate = get_rstate()
    rng = np.random.default_rng(5)
    A = rng.normal(size=(ndim, ndim)) * 0.2
    cov = np.eye(ndim) + A @ A.T
    cinv = np.linalg.inv(cov).astype(np.float64)
    lnorm = -0.5 * (np.log(2 * np.pi) * ndim +
                    np.log(np.linalg.det(cov)))
    truth = -ndim * np.log(20.0)

    def loglike(x):
        return -0.5 * jnp.dot(x, jnp.asarray(cinv) @ x) + lnorm

    def ptform(u):
        return 10.0 * (2.0 * u - 1.0)

    sampler = dytpu.NestedSampler(loglike, ptform, ndim, nlive=1000,
                                  bound="single", sample="rslice",
                                  rstate=rstate, queue_size=256)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert abs(res.logz[-1] - truth) < 5 * res.logzerr[-1], \
        (ndim, res.logz[-1], truth, res.logzerr[-1])


@pytest.mark.slow
def test_rosenbrock_posterior():
    # 2-D Rosenbrock: posterior mean of x0 vs brute-force quadrature
    prob = Rosenbrock(ndim=2)
    xg = np.linspace(-5, 5, 400)
    yg = np.linspace(-5, 5, 400)
    X, Y = np.meshgrid(xg, yg, indexing="ij")
    dens = np.exp(-(100.0 * (Y - X ** 2) ** 2 + (1 - X) ** 2))
    mean_x_truth = (dens.sum(axis=1) * xg).sum() / dens.sum()

    rstate = get_rstate()
    sampler = dytpu.NestedSampler(prob.loglike, prob.ptform, 2,
                                  nlive=500, bound="multi",
                                  sample="rslice", rstate=rstate,
                                  queue_size=128)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    eq = res.samples_equal(rstate=rstate)
    assert abs(eq[:, 0].mean() - mean_x_truth) < 0.2, \
        (eq[:, 0].mean(), mean_x_truth)
