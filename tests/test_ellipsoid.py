"""Geometry unit tests of the bounding classes (pattern of reference
``tests/test_ellipsoid.py``): sampling uniformity, overlap counts, MC
volumes vs analytic unions, covariance repair, splitter cluster
recovery."""

import itertools

import numpy as np
import pytest

import dynesty_tpu.bounding as db

from utils import get_rstate


def test_ellipsoid_sampling_uniform():
    rstate = get_rstate()
    ndim = 3
    cov = np.array([[1.0, 0.6, 0.0], [0.6, 1.0, 0.0], [0.0, 0.0, 0.25]])
    ell = db.Ellipsoid(ndim, ctr=np.zeros(ndim), cov=cov)
    xs = ell.samples(20000, rstate=rstate)
    # all inside
    d = ell.distance_many(xs)
    assert d.max() <= 1 + 1e-9
    # radial CDF of mahalanobis distance^ndim is uniform
    r = d ** ndim
    from scipy.stats import kstest
    assert kstest(r, "uniform").pvalue > 1e-4
    # volume matches analytic det-based value
    assert abs(ell.logvol -
               (db.logvol_prefactor(ndim) +
                0.5 * np.linalg.slogdet(cov)[1])) < 1e-10


def test_ellipsoid_scale_to_logvol():
    ell = db.Ellipsoid(2, ctr=np.zeros(2), cov=np.eye(2) * 0.01)
    target = ell.logvol + np.log(4.0)
    ell.scale_to_logvol(target)
    assert abs(ell.logvol - target) < 1e-10


def test_multiellipsoid_overlap_and_volume():
    rstate = get_rstate()
    ndim = 2
    r = 1.0
    sep = 1.0  # centers 1 apart, radius 1: known union volume
    ells = [
        db.Ellipsoid(ndim, ctr=np.array([0.0, 0.0]), cov=np.eye(2) * r),
        db.Ellipsoid(ndim, ctr=np.array([sep, 0.0]), cov=np.eye(2) * r),
    ]
    mell = db.MultiEllipsoid(ndim, ells=ells)
    # overlap counting
    assert mell.overlap(np.array([0.5, 0.0])) == 2
    assert mell.overlap(np.array([-0.9, 0.0])) == 1
    assert not mell.contains(np.array([3.0, 3.0]))
    # MC volume vs analytic circle-union area
    logvol_mc = mell.monte_carlo_logvol(ndraws=20000, rstate=rstate,
                                        return_overlap=False)
    d = sep
    lens_area = 2 * r * np.arccos(d / (2 * np.sqrt(r))) - \
        d / 2 * np.sqrt(4 * r - d ** 2)
    union = 2 * np.pi * r - lens_area
    assert abs(np.exp(logvol_mc) - union) < 0.15


def test_multiellipsoid_sampling_uniform():
    rstate = get_rstate()
    ells = [
        db.Ellipsoid(2, ctr=np.array([0.0, 0.0]), cov=np.eye(2)),
        db.Ellipsoid(2, ctr=np.array([1.0, 0.0]), cov=np.eye(2)),
    ]
    mell = db.MultiEllipsoid(2, ells=ells)
    xs = mell.samples(5000, rstate=rstate)
    # uniform over the union: compare left-half vs right-half symmetric
    # region counts around the symmetry axis x=0.5
    left = np.sum(xs[:, 0] < 0.5)
    right = np.sum(xs[:, 0] > 0.5)
    assert abs(left - right) < 5 * np.sqrt(len(xs))


def test_improve_covar_on_singular():
    pts = np.zeros((50, 3))
    pts[:, 0] = np.linspace(0, 1, 50)  # rank-1 cloud
    ell = db.bounding_ellipsoid(pts + 1e-12)
    d = ell.distance_many(pts)
    assert np.all(d <= 1 + 1e-6)


def test_splitter_cluster_recovery():
    # two well-separated blobs must split into >= 2 ellipsoids
    rstate = get_rstate()
    a = rstate.normal(size=(200, 2)) * 0.05
    b = rstate.normal(size=(200, 2)) * 0.05 + 5.0
    pts = np.vstack([a, b])
    mell = db.bounding_ellipsoids(pts)
    assert mell.nells >= 2
    assert all(mell.contains(p) for p in pts)
    # a single blob stays one ellipsoid
    mell2 = db.bounding_ellipsoids(a)
    assert mell2.nells == 1


def test_friends_bounds():
    rstate = get_rstate()
    pts = rstate.normal(size=(100, 2)) * 0.05 + 0.5
    for cls in (db.RadFriends, db.SupFriends):
        fb = cls(2)
        fb.update(pts, rstate=rstate)
        fb.ctrs = pts
        # every generating point is contained
        assert all(fb.contains(p) for p in pts)
        xs = fb.samples(500, rstate=rstate)
        assert xs.shape == (500, 2)
        # samples stay near the cloud
        assert np.abs(xs - 0.5).max() < 0.5


def test_kmeans_grid():
    # k-means split on a 6x6 grid of tight blobs keeps splitting deep
    rstate = get_rstate()
    centers = np.array(list(itertools.product(range(6), range(6))),
                       dtype=float)
    pts = np.concatenate([
        c + rstate.normal(size=(20, 2)) * 0.01 for c in centers
    ])
    mell = db.bounding_ellipsoids(pts)
    assert mell.nells >= 10
    assert all(mell.contains(p) for p in pts)


# ---------------------------------------------------------------------------
# batched-forest vs scalar-recursion splitter equivalence
#
# MultiEllipsoid.update takes the batched breadth-first splitter when
# pool is None and the scalar recursion when pooled; both realize the
# SAME algorithm (reference ``bounding.py:1464-1563``), so pooled and
# unpooled runs must traverse equivalent geometry.


def _splitter_point_sets():
    rs = np.random.Generator(np.random.PCG64(20260819))
    sets = {}
    # two well-separated gaussian blobs (clean 2-way split)
    blob = np.vstack([rs.normal([0, 0], 0.05, size=(120, 2)),
                      rs.normal([1, 1], 0.05, size=(120, 2))])
    sets["blobs2d"] = blob
    # four-cluster grid
    ctrs = np.array(list(itertools.product([0.2, 0.8], repeat=2)))
    sets["grid4"] = np.vstack([
        rs.normal(c, 0.03, size=(80, 2)) for c in ctrs])
    # thin 2-D annulus (the gaussian-shells geometry)
    th = rs.uniform(0, 2 * np.pi, 400)
    r = rs.normal(1.0, 0.02, 400)
    sets["annulus"] = np.column_stack([r * np.cos(th), r * np.sin(th)])
    # 3-D torus-like ring
    th = rs.uniform(0, 2 * np.pi, 500)
    sets["ring3d"] = np.column_stack([
        np.cos(th) + rs.normal(0, 0.05, 500),
        np.sin(th) + rs.normal(0, 0.05, 500),
        rs.normal(0, 0.05, 500)])
    # single 5-D gaussian cloud (no split expected)
    sets["cloud5d"] = rs.normal(0, 1.0, size=(200, 5))
    # uniform 4-D cube
    sets["cube4d"] = rs.uniform(0, 1, size=(300, 4))
    return sets


@pytest.mark.parametrize("name", sorted(_splitter_point_sets()))
def test_batched_splitter_matches_scalar(name):
    pts = _splitter_point_sets()[name]
    scalar = db._bounding_ellipsoids(pts, db.bounding_ellipsoid(pts))
    batched, expands = db._fit_multi_batched(pts)
    assert expands == []
    assert len(batched) == len(scalar), \
        f"{name}: batched nells {len(batched)} != scalar {len(scalar)}"
    # match ellipsoids by center ordering; volumes and centers agree
    key_s = np.lexsort(np.array([e.ctr for e in scalar]).T)
    key_b = np.lexsort(np.array([e.ctr for e in batched]).T)
    for i_s, i_b in zip(key_s, key_b):
        es, eb = scalar[i_s], batched[i_b]
        assert np.allclose(es.ctr, eb.ctr, atol=1e-8)
        assert abs(es.logvol - eb.logvol) < 1e-8
        assert np.allclose(es.cov, eb.cov, atol=1e-8)
    lv_s = db._logsumexp([e.logvol for e in scalar])
    lv_b = db._logsumexp([e.logvol for e in batched])
    assert abs(lv_s - lv_b) < 1e-8


class _InlinePool:
    """Minimal pool protocol: forces MultiEllipsoid.update onto the
    scalar (pooled) code path without spawning processes."""

    def map(self, fn, args):
        return list(map(fn, args))


@pytest.mark.parametrize("bootstrap", [0, 3])
def test_multiellipsoid_update_pool_equivalence(bootstrap):
    """Pooled and unpooled MultiEllipsoid.update must agree on the
    decomposition (nells, logvol, bootstrap expansion) for the same
    rstate: they run the scalar recursion and the batched forest
    respectively."""
    pts = _splitter_point_sets()["annulus"]
    m_batched = db.MultiEllipsoid(pts.shape[1])
    m_scalar = db.MultiEllipsoid(pts.shape[1])
    rs1 = np.random.Generator(np.random.PCG64(42))
    rs2 = np.random.Generator(np.random.PCG64(42))
    m_batched.update(pts, rstate=rs1, bootstrap=bootstrap, pool=None)
    m_scalar.update(pts, rstate=rs2, bootstrap=bootstrap,
                    pool=_InlinePool())
    assert m_batched.nells == m_scalar.nells
    assert abs(m_batched.logvol - m_scalar.logvol) < 1e-6
    assert abs(m_batched.last_expand - m_scalar.last_expand) < 1e-6
    assert np.allclose(np.sort(m_batched.logvol_ells),
                       np.sort(m_scalar.logvol_ells), atol=1e-6)
