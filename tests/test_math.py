"""Unit tests of the math substrate: integrals, geometry, statistics."""

import numpy as np
import pytest

from dynesty_tpu.ops.integrals import (compute_integrals,
                                       progress_integration,
                                       get_neff_from_logwt, LOWL_VAL)
from dynesty_tpu.ops.geometry import (unitcheck, unitcheck_batch,
                                      apply_reflect, apply_reflect_jax,
                                      randsphere, randsphere_batch,
                                      logvol_prefactor, mle_cov,
                                      improve_covar_mat)
from dynesty_tpu.utils.misc import (mean_and_cov, quantile, resample_equal,
                                    get_random_generator)

from utils import get_rstate


def test_compute_integrals_analytic():
    # exponential shells: L(X) = exp(-t) at X = exp(-t); with many samples
    # logz -> log(integral_0^1 L dX) ; use L = const for the simplest check
    n = 1000
    logvol = -np.arange(1, n + 1) * 0.01
    logl = np.zeros(n)
    logwt, logz, logzvar, h = compute_integrals(logl=logl, logvol=logvol)
    # trapezoid with L_{-1}=0: the first shell contributes half weight
    expected = np.log(1 - np.exp(logvol[-1]) -
                      0.5 * (1 - np.exp(logvol[0])))
    assert abs(logz[-1] - expected) < 1e-10
    assert np.all(np.diff(logz) >= 0)


def test_compute_integrals_matches_streaming():
    rstate = get_rstate()
    n = 500
    logl = np.sort(rstate.normal(size=n) * 5)
    dlv = 1.0 / 100
    logvol = -np.arange(1, n + 1) * dlv
    logwt, logz, logzvar, h = compute_integrals(logl=logl, logvol=logvol)

    # streaming one-step accumulation must agree
    s_logz, s_logzvar, s_h = LOWL_VAL, 0.0, 0.0
    loglstar = LOWL_VAL
    for i in range(n):
        _, s_logz, s_logzvar, s_h = progress_integration(
            loglstar, logl[i], s_logz, s_logzvar, logvol[i], dlv, s_h)
        loglstar = logl[i]
    assert abs(s_logz - logz[-1]) < 1e-8
    assert abs(s_h - h[-1]) < 1e-6


def test_gaussian_shell_integral():
    # 1-D gaussian likelihood, uniform prior on [-10, 10]:
    # Z = int N(x;0,1) dx/20 = 1/20
    n = 30000
    rstate = get_rstate()
    # simulate a perfect NS run: X_i shrink deterministically
    logvol = -np.arange(1, n + 1) * (10.0 / n)
    x = 10 * np.exp(logvol)  # |x| value at that volume: X = 2x/20 = x/10
    logl = -0.5 * x**2 - 0.5 * np.log(2 * np.pi)
    _, logz, _, _ = compute_integrals(logl=logl, logvol=logvol)
    assert abs(logz[-1] - np.log(1 / 20.0)) < 1e-3


def test_neff():
    logwt = np.zeros(100)
    assert abs(get_neff_from_logwt(logwt) - 100) < 1e-10
    logwt = np.array([0.0, -np.inf])
    assert abs(get_neff_from_logwt(logwt) - 1) < 1e-10


def test_unitcheck():
    assert unitcheck(np.array([0.5, 0.2]))
    assert not unitcheck(np.array([0.5, 1.2]))
    nb = np.array([True, False])
    assert unitcheck(np.array([0.5, 1.2]), nb)
    assert not unitcheck(np.array([1.2, 0.5]), nb)
    # batch version agrees
    rstate = get_rstate()
    u = rstate.random((100, 2)) * 2 - 0.5
    got = np.asarray(unitcheck_batch(u, nb))
    want = np.array([unitcheck(x, nb) for x in u])
    assert np.array_equal(got, want)
    got0 = np.asarray(unitcheck_batch(u))
    want0 = np.array([unitcheck(x) for x in u])
    assert np.array_equal(got0, want0)


def test_apply_reflect():
    vals = np.array([-0.9, 1.1, 2.9, 0.3, -2.3])
    expect = np.array([0.9, 0.9, 0.9, 0.3, 0.3])
    assert np.allclose(apply_reflect(vals), expect)
    assert np.allclose(np.asarray(apply_reflect_jax(vals)), expect)


def test_randsphere_uniform():
    rstate = get_rstate()
    n = 2
    pts = np.array([randsphere(n, rstate) for _ in range(5000)])
    r = np.linalg.norm(pts, axis=1)
    assert r.max() <= 1.0
    # CDF of r in 2-D ball is r^2: mean of r^2 should be 0.5
    assert abs(np.mean(r**2) - 0.5) < 0.03
    # device version
    import jax
    pts2 = np.asarray(randsphere_batch(jax.random.key(0), (5000,), n))
    r2 = np.linalg.norm(pts2, axis=1)
    assert r2.max() <= 1.0
    assert abs(np.mean(r2**2) - 0.5) < 0.03


def test_logvol_prefactor():
    # known ball volumes: V_2 = pi, V_3 = 4/3 pi
    assert abs(np.exp(logvol_prefactor(2)) - np.pi) < 1e-12
    assert abs(np.exp(logvol_prefactor(3)) - 4 * np.pi / 3) < 1e-12
    # cube (p=inf) volume is 2^n
    assert abs(np.exp(logvol_prefactor(3, p=np.inf)) - 8) < 1e-9


def test_improve_covar():
    good, cov, am, axes, (ev, evec) = improve_covar_mat(np.eye(3))
    assert good
    assert np.allclose(cov, np.eye(3))
    # the returned eigendecomposition reconstructs cov
    assert np.allclose((evec * ev) @ evec.T, cov)
    # singular matrix gets repaired
    singular = np.outer([1.0, 1.0], [1.0, 1.0])
    good, cov, am, axes, _ = improve_covar_mat(singular)
    assert not good
    vals = np.linalg.eigvalsh(cov)
    assert np.all(vals > 0)


def test_weighted_stats():
    rstate = get_rstate()
    x = rstate.normal(size=(10000, 2)) @ np.array([[1.0, 0.5], [0.0, 1.0]])
    w = np.ones(len(x))
    mean, cov = mean_and_cov(x, w)
    assert np.allclose(mean, x.mean(axis=0))
    assert np.allclose(cov, np.cov(x, rowvar=False), rtol=1e-2, atol=1e-2)
    q = quantile(x[:, 0], [0.5], weights=w)
    assert abs(q[0] - np.median(x[:, 0])) < 0.05


def test_resample_equal():
    rstate = get_rstate()
    samples = np.arange(4).reshape(-1, 1).astype(float)
    weights = np.array([0.25, 0.25, 0.25, 0.25])
    out = resample_equal(samples, weights, rstate=rstate)
    assert sorted(out.ravel().tolist()) == [0.0, 1.0, 2.0, 3.0]
    # concentrated weights reproduce the heavy sample
    weights = np.array([1.0, 0.0, 0.0, 0.0])
    out = resample_equal(samples, weights, rstate=rstate)
    assert np.all(out == 0)


def test_mle_cov():
    rstate = get_rstate()
    x = rstate.normal(size=(2000, 3))
    c = mle_cov(x)
    assert np.allclose(c, np.cov(x, rowvar=False), atol=0.05)


def test_pallas_pairwise_min_dist():
    from dynesty_tpu.ops.pallas_kernels import (pairwise_min_dist,
                                                pairwise_min_dist_reference)

    rstate = get_rstate()
    pts = rstate.normal(size=(300, 8)).astype(np.float32)
    ref = np.asarray(pairwise_min_dist_reference(pts, p=2))
    got = np.asarray(pairwise_min_dist(pts, p=2, interpret=True))
    assert np.abs(got - ref).max() < 1e-5
    gotinf = np.asarray(pairwise_min_dist(pts, p=np.inf))
    refinf = np.asarray(pairwise_min_dist_reference(pts, p=np.inf))
    assert np.abs(gotinf - refinf).max() < 1e-6
