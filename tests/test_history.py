"""Evaluation-history (HDF5) completeness: for a completed run the
history must contain exactly ``sampler.ncall`` entries (reference
``tests/test_misc.py:729-871``)."""

import os
import tempfile

import numpy as np
import jax.numpy as jnp
import pytest

import dynesty_tpu as dytpu

from utils import get_rstate

NDIM = 2
LNORM = -0.5 * np.log(2 * np.pi) * NDIM


def loglike(x):
    return -0.5 * jnp.sum(x * x) + LNORM


def ptform(u):
    return 10.0 * (2.0 * u - 1.0)


def test_history_completeness():
    h5py = pytest.importorskip("h5py")
    with tempfile.TemporaryDirectory() as tmp:
        fname = os.path.join(tmp, "hist.h5")
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=50,
                                      bound="single", sample="unif",
                                      rstate=rstate, queue_size=16,
                                      save_evaluation_history=True,
                                      history_filename=fname)
        sampler.run_nested(dlogz=0.1, print_progress=False)
        assert os.path.exists(fname)
        with h5py.File(fname, "r") as fp:
            assert "evaluation_u" in fp
            assert "evaluation_v" in fp
            assert "evaluation_logl" in fp
            n_hist = len(fp["evaluation_logl"])
            assert n_hist == sampler.ncall, (n_hist, sampler.ncall)
            assert len(fp["evaluation_u"]) == n_hist
            assert len(fp["evaluation_v"]) == n_hist
            assert not np.any(np.isnan(fp["evaluation_logl"][:]))
            assert not np.any(np.isnan(fp["evaluation_u"][:]))
            assert not np.any(np.isnan(fp["evaluation_v"][:]))


def test_history_host_mode():
    h5py = pytest.importorskip("h5py")

    def np_loglike(x):
        return -0.5 * np.dot(x, x) + LNORM

    with tempfile.TemporaryDirectory() as tmp:
        fname = os.path.join(tmp, "hist.h5")
        rstate = get_rstate()
        sampler = dytpu.NestedSampler(np_loglike, ptform, NDIM, nlive=50,
                                      bound="single", sample="unif",
                                      rstate=rstate, queue_size=16,
                                      likelihood_mode="host",
                                      save_evaluation_history=True,
                                      history_filename=fname)
        sampler.run_nested(dlogz=0.1, print_progress=False)
        with h5py.File(fname, "r") as fp:
            assert len(fp["evaluation_logl"]) == sampler.ncall
