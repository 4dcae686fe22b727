"""
dynesty_tpu — a TPU-native (JAX/XLA/Pallas) dynamic nested sampling framework.

A from-scratch re-design of the capabilities of dynesty
(github.com/joshspeagle/dynesty, mounted read-only at /root/reference) for
TPU hardware:

* live points, bounds and proposals are fixed-shape pytrees,
* constrained-proposal kernels (uniform-in-bound, random walk, slice,
  random slice) are vmapped over a wide proposal batch and run as a single
  jitted "round" per queue refill (one host<->device round trip per refill),
* the user log-likelihood and prior transform are evaluated in wide device
  batches (optionally sharded over a `jax.sharding.Mesh`),
* the sequential nested-sampling shell (shrinkage, trapezoid evidence
  integration, plateau handling, dynamic batch allocation, run merging,
  error analysis, checkpointing) is exact, float64 host code.

Public API mirrors the reference (``dynesty.py:578-774``):
``NestedSampler``, ``DynamicNestedSampler``, ``pool.Pool`` (compatibility
shim), plus ``plotting`` and ``utils``.
"""

from ._version import __version__
from .dynesty import NestedSampler, DynamicNestedSampler
from . import bounding
from . import internal
from . import utils
from . import ops
from . import pool

__all__ = [
    "NestedSampler",
    "DynamicNestedSampler",
    "bounding",
    "internal",
    "utils",
    "ops",
    "pool",
    "__version__",
]
