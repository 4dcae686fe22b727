"""Quick start: static + dynamic fits of a 3-D correlated Gaussian
(the reference's quickstart problem, ``docs/source/quickstart.rst``).

Run: python examples/quickstart.py
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import dynesty_tpu as dytpu
from dynesty_tpu import plotting

ndim = 3
cov = np.identity(ndim)
cov[cov == 0] = 0.95
cinv = np.linalg.inv(cov)
lnorm = -0.5 * (np.log(2 * np.pi) * ndim + np.log(np.linalg.det(cov)))
logz_truth = -ndim * np.log(20.0)


def loglike(x):
    return -0.5 * jnp.dot(x, jnp.asarray(cinv) @ x) + lnorm


def ptform(u):
    return 10.0 * (2.0 * u - 1.0)


def main():
    # static run
    sampler = dytpu.NestedSampler(loglike, ptform, ndim, nlive=500,
                                  bound="multi", sample="unif",
                                  queue_size=256)
    sampler.run_nested()
    res = sampler.results
    res.summary()
    print(f"truth: {logz_truth:.3f} "
          f"(pull {(res.logz[-1] - logz_truth) / res.logzerr[-1]:.2f} sigma)")

    # dynamic run with posterior-weighted batches
    dns = dytpu.DynamicNestedSampler(loglike, ptform, ndim)
    dns.run_nested(nlive_init=500, nlive_batch=100, maxbatch=5)
    dres = dns.results
    dres.summary()

    # plots
    fig, _ = plotting.runplot(res, lnz_truth=logz_truth)
    fig.savefig("quickstart_runplot.png")
    fig, _ = plotting.cornerplot(dres, show_titles=True,
                                 truths=[0.0] * ndim)
    fig.savefig("quickstart_corner.png")
    print("wrote quickstart_runplot.png, quickstart_corner.png")


if __name__ == "__main__":
    main()
