"""200-D iid normal with bound='none' and random slice sampling (the
reference's ``demos/Examples -- 200-D Multivariate Normal.ipynb``).

This is the high-dimensional stress configuration: no bounding geometry,
slice chains along random directions, wide proposal batches. Expect a
long run; pass --quick for a truncated sanity run.

Run: python examples/highdim_200.py [--quick]
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

import dynesty_tpu as dytpu

NDIM = 200
SIGMA = 1.0
PRIOR_WIN = 10.0


def loglike(x):
    return (-0.5 * jnp.sum((x / SIGMA) ** 2) -
            0.5 * NDIM * np.log(2 * np.pi * SIGMA ** 2))


def ptform(u):
    return PRIOR_WIN * (2.0 * u - 1.0)


def main():
    quick = "--quick" in sys.argv
    truth = -NDIM * np.log(2 * PRIOR_WIN)
    sampler = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=500,
                                  bound="none", sample="rslice",
                                  slices=40, queue_size=256,
                                  rounds_per_dispatch=2)
    sampler.run_nested(maxiter=2000 if quick else None)
    res = sampler.results
    res.summary()
    if not quick:
        print(f"truth: {truth:.1f} "
              f"(pull {(res.logz[-1] - truth) / res.logzerr[-1]:.2f})")
        eq = res.samples_equal()
        print("posterior std of first dims:",
              eq[:, :5].std(axis=0).round(3), "(truth 1.0)")


if __name__ == "__main__":
    main()
