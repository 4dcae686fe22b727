"""Child-process entry for the SIGTERM fault-injection resume tests.

Imported by ``multiprocessing`` spawn children, so the platform setup at
module import time runs BEFORE any JAX backend initialization (the env
var alone is not enough on hosts with a TPU plugin, which outranks it —
the config API pins the platform reliably).
"""

import os

os.environ.setdefault("DYNESTY_TPU_NO_COMPILATION_CACHE", "1")

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

import numpy as np  # noqa: E402
import jax.numpy as jnp  # noqa: E402

NDIM = 2
SEED = 56432


def loglike(x):
    return -0.5 * jnp.sum(x * x) - NDIM * 0.5 * np.log(2 * np.pi)


def ptform(u):
    return 10.0 * (2.0 * u - 1.0)


def run_fit(dynamic, checkpoint_file):
    """One full (checkpointing) fit; returns (logz, logzerr, niter)."""
    import dynesty_tpu as dytpu

    rstate = np.random.Generator(np.random.PCG64(SEED))
    if dynamic:
        s = dytpu.DynamicNestedSampler(loglike, ptform, NDIM,
                                       bound="single", sample="unif",
                                       rstate=rstate, queue_size=32)
        s.run_nested(nlive_init=100, nlive_batch=60, maxbatch=3,
                     n_effective=1000, print_progress=False,
                     checkpoint_file=checkpoint_file,
                     checkpoint_every=0.01)
    else:
        s = dytpu.NestedSampler(loglike, ptform, NDIM, nlive=100,
                                bound="single", sample="unif",
                                rstate=rstate, queue_size=32)
        s.run_nested(print_progress=False,
                     checkpoint_file=checkpoint_file,
                     checkpoint_every=0.01)
    r = s.results
    return float(r.logz[-1]), float(r.logzerr[-1]), int(r.niter)


def child_main(dynamic, checkpoint_file, result_queue):
    """Run the fit to completion; the parent may SIGTERM us mid-flight."""
    out = run_fit(dynamic, checkpoint_file)
    result_queue.put(out)


def resume_fit(dynamic, checkpoint_file):
    """Restore from the checkpoint and run to completion."""
    import dynesty_tpu as dytpu

    if dynamic:
        s = dytpu.DynamicNestedSampler.restore(checkpoint_file)
        s.run_nested(nlive_init=100, nlive_batch=60, maxbatch=3,
                     n_effective=1000, print_progress=False, resume=True,
                     checkpoint_file=checkpoint_file,
                     checkpoint_every=0.01)
    else:
        s = dytpu.NestedSampler.restore(checkpoint_file)
        s.run_nested(print_progress=False, resume=True,
                     checkpoint_file=checkpoint_file,
                     checkpoint_every=0.01)
    r = s.results
    return float(r.logz[-1]), float(r.logzerr[-1]), int(r.niter)
