"""Multi-chip sharding tests on the virtual 8-device CPU mesh
(conftest sets --xla_force_host_platform_device_count=8)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu
from dynesty_tpu.parallel import make_mesh, shard_batch, batch_sharding

from utils import get_rstate

NDIM = 3
LOGZ_TRUTH = NDIM * (-np.log(20.0))

_CINV = np.linalg.inv(np.identity(NDIM) + 0.95 * (1 - np.identity(NDIM)))
_LNORM = -0.5 * (np.log(2 * np.pi) * NDIM +
                 np.log(np.linalg.det(np.linalg.inv(_CINV))))


def _pickle_loglike(x):
    return -0.5 * jnp.dot(x, jnp.asarray(_CINV) @ x) + _LNORM


def _pickle_ptform(u):
    return 10.0 * (2.0 * u - 1.0)


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


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_helpers():
    mesh = make_mesh(8)
    x = np.arange(64, dtype=np.float64).reshape(16, 4)
    xs = shard_batch(mesh, x)
    assert xs.sharding == batch_sharding(mesh, 2)
    assert np.array_equal(np.asarray(xs), x)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_sharded_run():
    # a full static fit with the proposal batch sharded over 8 devices
    loglike, ptform = _gau()
    mesh = make_mesh(8)
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=150,
                                  bound="single", sample="rwalk",
                                  rstate=rstate, queue_size=32,
                                  mesh=mesh)
    sampler.run_nested(print_progress=False)
    res = sampler.results
    assert abs(res.logz[-1] - LOGZ_TRUTH) < 5 * res.logzerr[-1]


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
@pytest.mark.parametrize("sample,bound,blob",
                         [("unif", "single", False),
                          ("rslice", "single", False),
                          ("rwalk", "single", False),
                          ("unif", "multi", False),
                          ("rslice", "single", True),
                          ("slice", "single", False),
                          ("unif", "balls", False),
                          ("unif", "cubes", False),
                          ("rwalk", "multi", False)])
def test_mesh_equivalence(sample, bound, blob):
    """An 8-device sharded run must reproduce the 1-device run: same RNG
    stream, same proposals, same records (up to reduction round-off) —
    across kernels, multi-ellipsoid bounds, and blobs (reference
    analogue: the pool works for every combination, tests/test_pool.py)."""
    loglike, ptform = _gau()
    if blob:
        base = loglike

        def loglike(x):  # noqa: F811 -- blob variant of the same problem
            logl = base(x)
            return logl, 2.0 * logl

    results = {}
    for m in (make_mesh(8), None):
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=200,
                                      bound=bound, sample=sample,
                                      blob=blob, rstate=rstate,
                                      queue_size=64, mesh=m)
        sampler.run_nested(print_progress=False, maxiter=500,
                           add_live=False)
        results["mesh" if m else "single"] = sampler.results
    rm, rs = results["mesh"], results["single"]
    assert int(np.sum(rm.ncall)) == int(np.sum(rs.ncall))
    assert len(rm.logl) == len(rs.logl)
    assert np.allclose(rm.logl, rs.logl, rtol=1e-10)
    assert np.allclose(rm.logz[-1], rs.logz[-1], rtol=1e-8)
    if blob:
        bm = np.asarray(rm.blob, dtype=np.float64)
        bs = np.asarray(rs.blob, dtype=np.float64)
        assert np.allclose(bm, bs, rtol=1e-10)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_rejects_host_mode():
    """io_callback paths have no defined semantics on a sharded lane
    axis: host-mode likelihoods and unif-over-custom-bounds must raise."""
    loglike, ptform = _gau()
    mesh = make_mesh(8)

    def np_loglike(x):
        return -0.5 * float(np.dot(x, x))

    with pytest.raises(ValueError, match="host"):
        dytpu.NestedSampler(np_loglike, ptform, NDIM, nlive=100,
                            bound="single", sample="unif",
                            likelihood_mode="host", rstate=get_rstate(),
                            queue_size=16, mesh=mesh)

    from dynesty_tpu.bounding import Bound

    class BoxBound(Bound):
        """Host-only custom bound (no device_spec override)."""

        def __init__(self, ndim):
            super().__init__(ndim)

        def contains(self, x):
            return True

        def samples(self, n, rstate=None):
            return rstate.random((n, NDIM))

        def get_random_axes(self, rstate):
            return np.eye(NDIM)

        def update(self, points, **kwargs):
            pass

    with pytest.raises(ValueError, match="custom"):
        dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                            bound=BoxBound(NDIM), sample="unif",
                            rstate=get_rstate(), queue_size=16, mesh=mesh)


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_compute_is_partitioned():
    """The round's proposal block must be lane-sharded over the mesh:
    each device owns exactly q/n_devices lanes."""
    from jax.sharding import NamedSharding, PartitionSpec

    loglike, ptform = _gau()
    mesh = make_mesh(8)
    rstate = get_rstate()
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=200,
                                  bound="single", sample="rslice",
                                  rstate=rstate, queue_size=64, mesh=mesh)
    sampler.run_nested(print_progress=False, maxiter=200, add_live=False)
    sh = sampler.last_proposals_sharding
    assert sh == NamedSharding(mesh, PartitionSpec("q"))
    # per-device slice of the lane axis
    q = sampler.queue_size * sampler.rounds_per_dispatch
    shard_rows = q // 8
    assert sh.shard_shape((q, 11))[0] == shard_rows


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_queue_divisibility():
    # queue width is rounded to a multiple of the mesh size
    loglike, ptform = _gau()
    mesh = make_mesh(8)
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                  bound="single", sample="rwalk",
                                  rstate=get_rstate(), queue_size=35,
                                  mesh=mesh)
    assert sampler.queue_size % 8 == 0


def test_graft_entry():
    import importlib.util
    import os

    path = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "__graft_entry__.py")
    spec = importlib.util.spec_from_file_location("graft_entry", path)
    ge = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(ge)
    fn, args = ge.entry()
    out = jax.jit(fn)(*args)
    jax.block_until_ready(out)
    ge.dryrun_multichip(min(8, len(jax.devices())))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_scaling_report():
    # the telemetry must really partition the batch at every mesh size
    # and produce finite throughput numbers (thread-level scaling on the
    # virtual host mesh; ICI scaling on real chips)
    from dynesty_tpu.parallel import scaling_report

    loglike, _ = _gau()
    rep = scaling_report(loglike, NDIM, q=256, sizes=(1, 4, 8), reps=3,
                         chain=2, rstate=get_rstate())
    assert [r["n_devices"] for r in rep] == [1, 4, 8]
    for r in rep:
        assert r["partitioned"]
        assert np.isfinite(r["evals_per_s"]) and r["evals_per_s"] > 0
    assert rep[0]["speedup"] == 1.0


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_dynamic_equivalence():
    """The dynamic layer hands the mesh to the base run AND every batch
    sampler; an 8-device dynamic run must reproduce the 1-device run
    (reference analogue: the pool drives dynamic runs identically,
    tests/test_pool.py + test_dyn.py)."""
    loglike, ptform = _gau()
    results = {}
    for m in (make_mesh(8), None):
        rstate = get_rstate()
        sampler = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                             bound="multi", sample="unif",
                                             rstate=rstate, queue_size=64,
                                             mesh=m)
        # widths chosen so every queue clamp lands on a multiple of the
        # mesh size: the sharded run then consumes the identical RNG
        # stream and the comparison below can be (near-)exact
        sampler.run_nested(print_progress=False, nlive_init=160,
                           nlive_batch=64, maxbatch=2,
                           dlogz_init=1.0)
        results["mesh" if m else "single"] = sampler.results
    rm, rs = results["mesh"], results["single"]
    assert len(rm.logl) == len(rs.logl)
    assert np.allclose(rm.logl, rs.logl, rtol=1e-10)
    assert np.allclose(rm.logz[-1], rs.logz[-1], rtol=1e-8)
    assert int(np.sum(rm.ncall)) == int(np.sum(rs.ncall))


@pytest.mark.skipif(len(jax.devices()) < 8, reason="needs 8 devices")
def test_mesh_restore(tmp_path):
    """Meshes are process-local and never pickled; restore(mesh=...) must
    re-attach one and finish bit-identically to an uninterrupted sharded
    run, and a non-divisible mesh must be rejected."""

    def _sampler():
        # module-level (picklable) problem functions
        return dytpu.NestedSampler(_pickle_loglike, _pickle_ptform, NDIM,
                                   nlive=200, bound="single",
                                   sample="unif", rstate=get_rstate(),
                                   queue_size=64, mesh=make_mesh(8))

    full = _sampler()
    full.run_nested(print_progress=False)

    part = _sampler()
    part.run_nested(maxiter=400, add_live=False, print_progress=False)
    fname = str(tmp_path / "mesh.save")
    part.save(fname)

    with pytest.raises(ValueError, match="divide"):
        dytpu.NestedSampler.restore(fname, mesh=make_mesh(3))

    # a mesh whose size divides queue_size but NOT the pickled endgame
    # widths (_q_narrow) must be rejected too: a bracketed batch
    # dispatches the narrow width directly
    n48 = dytpu.NestedSampler(_pickle_loglike, _pickle_ptform, NDIM,
                              nlive=200, bound="single", sample="unif",
                              rstate=get_rstate(), queue_size=48,
                              mesh=make_mesh(8))
    assert n48.queue_size % 3 == 0 and n48._q_narrow % 3 != 0
    fname48 = str(tmp_path / "mesh48.save")
    n48.save(fname48)
    with pytest.raises(ValueError, match="_q_narrow"):
        dytpu.NestedSampler.restore(fname48, mesh=make_mesh(3))

    resumed = dytpu.NestedSampler.restore(fname, mesh=make_mesh(8))
    assert resumed.mesh is not None
    resumed.run_nested(resume=True, print_progress=False)
    rf, rr = full.results, resumed.results
    assert np.array_equal(rf.logl, rr.logl)
    assert rf.logz[-1] == rr.logz[-1]
    assert int(np.sum(rf.ncall)) == int(np.sum(rr.ncall))
