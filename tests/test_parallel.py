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
