"""Smoke tests of all plotting functions on a small real run (reference
``tests/test_plot.py``): every figure must build without error for both
static and dynamic results, including bound visualizations from saved
bounds."""

import numpy as np
import jax.numpy as jnp
import pytest

matplotlib = pytest.importorskip("matplotlib")
matplotlib.use("Agg")
import matplotlib.pyplot as plt  # noqa: E402

import dynesty_tpu as dytpu  # noqa: E402
from dynesty_tpu import plotting as dyplot  # noqa: E402

from utils import get_rstate  # noqa: E402

NDIM = 2
LNORM = -0.5 * np.log(2 * np.pi) * NDIM


def loglike(x):
    return -0.5 * jnp.sum(x * x) + LNORM


def ptform(u):
    return 10.0 * (2.0 * u - 1.0)


@pytest.fixture(scope="module")
def static_results():
    rstate = get_rstate()
    s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                            bound="multi", sample="unif", rstate=rstate,
                            queue_size=32)
    s.run_nested(print_progress=False, save_bounds=True)
    return s.results


@pytest.fixture(scope="module")
def dynamic_results():
    rstate = get_rstate()
    d = dytpu.DynamicNestedSampler(loglike, ptform, NDIM, bound="multi",
                                   sample="unif", rstate=rstate,
                                   queue_size=32)
    d.run_nested(nlive_init=100, nlive_batch=60, maxbatch=1,
                 n_effective=500, print_progress=False)
    return d.results


def test_runplot(static_results):
    fig, axes = dyplot.runplot(static_results,
                               lnz_truth=NDIM * (-np.log(20.0)))
    plt.close(fig)


def test_runplot_dynamic(dynamic_results):
    fig, axes = dyplot.runplot(dynamic_results)
    plt.close(fig)


def test_traceplot(static_results):
    fig, axes = dyplot.traceplot(static_results, show_titles=True)
    plt.close(fig)


def test_cornerpoints(static_results):
    fig, axes = dyplot.cornerpoints(static_results)
    plt.close(fig)


def test_cornerplot(static_results):
    fig, axes = dyplot.cornerplot(static_results, show_titles=True,
                                  truths=np.zeros(NDIM))
    plt.close(fig)


def test_cornerplot_dynamic(dynamic_results):
    fig, axes = dyplot.cornerplot(dynamic_results)
    plt.close(fig)


def test_boundplot(static_results):
    fig, ax = dyplot.boundplot(static_results, dims=(0, 1), it=100,
                               ndraws=200, rstate=get_rstate())
    plt.close(fig)
    # by dead-point index, pushed through the prior transform
    fig, ax = dyplot.boundplot(static_results, dims=(0, 1),
                               idx=len(static_results.logl) // 2,
                               prior_transform=ptform, ndraws=200,
                               rstate=get_rstate())
    plt.close(fig)


def test_cornerbound(static_results):
    fig, axes = dyplot.cornerbound(static_results, it=100, ndraws=200,
                                   rstate=get_rstate())
    plt.close(fig)


def test_hist2d(static_results):
    samples = np.asarray(static_results.samples)
    fig, ax = plt.subplots()
    dyplot._hist2d(samples[:, 0], samples[:, 1], ax=ax,
                   weights=static_results.importance_weights())
    plt.close(fig)


def test_runplot_kde(static_results):
    # KDE-smoothed weight panel (reference plotting.py:255-259)
    fig, axes = dyplot.runplot(static_results, kde=True, nkde=200)
    plt.close(fig)


def test_boundplot_periodic_reflective(static_results):
    # wrapped draws for periodic / reflective dimensions
    fig, ax = dyplot.boundplot(static_results, dims=(0, 1), it=100,
                               ndraws=100, periodic=[0], reflective=[1],
                               rstate=get_rstate())
    plt.close(fig)
