"""Test configuration: CPU platform (virtual 8-device mesh for sharding
tests) and float64 enabled, set before JAX initializes."""

import os
import sys

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
# hermetic tests: skip the on-disk XLA cache (avoids cross-machine AOT
# feature mismatches)
os.environ.setdefault("DYNESTY_TPU_NO_COMPILATION_CACHE", "1")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax  # noqa: E402

# The sandbox pins JAX_PLATFORMS=axon (TPU tunnel); tests run on CPU unless
# explicitly requested.
if os.environ.get("DYNESTY_TPU_TEST_PLATFORM", "cpu") == "cpu":
    jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)


import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Drop live compiled executables between modules: long single-process
    runs accumulate XLA:CPU state that has been observed to corrupt a
    later backend compile (deterministic SIGSEGV ~90 programs in)."""
    yield
    import jax
    jax.clear_caches()
