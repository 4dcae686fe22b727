"""Mesh scaling telemetry: measured throughput of the sharded batched
likelihood across mesh sizes.

The reference's only scaling evidence is the process pool's wall-clock
(``/root/reference/tests/test_pool.py`` asserts correctness, not speed).
Here the parallel axis is a device mesh, so scaling is measurable
directly: ``scaling_report`` jits the batched likelihood over a 1-D mesh
of each size, times steady-state dispatches, and reports evaluations/s
plus the speedup over the single-device mesh.

On real multi-chip hardware the numbers reflect ICI-backed SPMD scaling.
On a virtual host mesh (``--xla_force_host_platform_device_count=N``)
they validate that XLA actually partitions the computation (entry
``partitioned=True``) and measure thread-level scaling of the host
backend — useful as a harness check, not as TPU scaling evidence; the
report marks which case it measured via ``platform``.
"""

import time

import numpy as np
import jax
import jax.numpy as jnp

from .mesh import batch_sharding, make_mesh

__all__ = ["scaling_report"]


def scaling_report(loglike, ndim, q=4096, sizes=None, devices=None,
                   reps=20, chain=8, rstate=None):
    """Measure sharded batched-likelihood throughput per mesh size.

    Parameters
    ----------
    loglike : callable
        Traceable per-point log-likelihood ``f(x: (ndim,)) -> scalar``.
    ndim : int
        Input dimensionality.
    q : int
        Proposal-batch width (must be divisible by every mesh size).
    sizes : sequence of int, optional
        Mesh sizes to measure; default = divisors of the device count.
    devices : sequence, optional
        Devices to build meshes from (default ``jax.devices()``).
    reps : int
        Timed dispatches per size (one warm-up dispatch compiles).
    chain : int
        Batch evaluations chained per dispatch via ``lax.scan`` so the
        fixed dispatch cost amortizes (mirrors fused proposal rounds).
    rstate : numpy Generator, optional
        Source for the input batch.

    Returns
    -------
    list of dict
        One entry per mesh size: ``n_devices``, ``evals_per_s``,
        ``speedup`` (vs the first size), ``partitioned`` (whether XLA
        sharded the output across devices), ``platform``.
    """
    devices = list(jax.devices()) if devices is None else list(devices)
    if sizes is None:
        sizes = [n for n in (1, 2, 4, 8, 16, 32) if len(devices) % n == 0
                 and n <= len(devices)]
    rstate = rstate or np.random.Generator(np.random.PCG64(0))
    x_host = rstate.random((q, ndim))
    platform = devices[0].platform

    def run(x):
        def step(x, _):
            logl = jax.vmap(loglike)(x)
            # fold the output back in so the chain cannot be elided
            return x + 1e-12 * logl[:, None], logl.sum()

        x, tot = jax.lax.scan(step, x, None, length=chain)
        return tot.sum()

    report = []
    base = None
    for n in sizes:
        if q % n != 0:
            raise ValueError(f"q={q} not divisible by mesh size {n}")
        mesh = make_mesh(n_devices=n, devices=devices[:n])
        sharding = batch_sharding(mesh, 2)
        x = jax.device_put(jnp.asarray(x_host), sharding)
        fn = jax.jit(run, in_shardings=(sharding,))
        out = fn(x)
        out.block_until_ready()  # compile
        t0 = time.perf_counter()
        for _ in range(reps):
            out = fn(x)
        out.block_until_ready()
        dt = (time.perf_counter() - t0) / reps
        evals_per_s = chain * q / dt
        if base is None:
            base = evals_per_s
        # partitioning check: the sharded input must actually live on n
        # devices (catches silently-replicated layouts)
        n_used = len({s.device for s in x.addressable_shards})
        report.append({
            "n_devices": n,
            "evals_per_s": round(evals_per_s, 1),
            "speedup": round(evals_per_s / base, 3),
            "partitioned": n_used == n,
            "platform": platform,
        })
    return report
