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

import os as _os

import jax as _jax

# Proposal rounds are heavyweight compilations reused across runs and
# processes; a persistent compilation cache makes cold starts cheap.
# Opt out with DYNESTY_TPU_NO_COMPILATION_CACHE=1 or by configuring
# jax_compilation_cache_dir yourself before importing dynesty_tpu.
if not _os.environ.get("DYNESTY_TPU_NO_COMPILATION_CACHE"):
    if _jax.config.jax_compilation_cache_dir is None:
        # The cache path is salted with the host CPU's feature set:
        # XLA:CPU entries hold AOT-compiled machine code, and loading an
        # artifact compiled on a host with different vector extensions
        # can SIGILL (observed after a container migration).  A per-host
        # cache trades cold starts across machines for safety.
        import hashlib as _hashlib
        try:
            with open("/proc/cpuinfo") as _f:
                _id = "".join(
                    _l for _l in _f
                    if _l.startswith(("flags", "model name", "vendor_id")))
                if not _id:
                    raise OSError
            # the model name matters beyond the flag list: LLVM picks
            # per-µarch tuning features (e.g. prefer-no-scatter) that are
            # baked into AOT artifacts but invisible in cpuinfo flags
            _salt = _hashlib.sha1(_id.encode()).hexdigest()[:12]
        except OSError:
            _salt = "generic"
        _jax.config.update(
            "jax_compilation_cache_dir",
            _os.path.expanduser("~/.cache/dynesty_tpu_xla-" + _salt))
        _jax.config.update("jax_persistent_cache_min_compile_time_secs",
                           0.5)

from ._version import __version__
from .dynesty import NestedSampler, DynamicNestedSampler
from . import bounding
from . import internal
from . import utils
from . import ops
from . import pool
from . import plotting
from . import models
from . import results
from . import internal_samplers
from . import dynamicsampler

__all__ = [
    "NestedSampler",
    "DynamicNestedSampler",
    "bounding",
    "internal",
    "internal_samplers",
    "utils",
    "ops",
    "pool",
    "plotting",
    "models",
    "results",
    "dynamicsampler",
    "__version__",
]
