"""Test harness: run everything on a virtual 8-device CPU mesh.

The distributed tests (SURVEY.md section 4, "Distributed tests") need multiple
devices; single-chip kernels are platform-agnostic, so CPU keeps the suite
fast and hermetic. Set VO_TEST_TPU=1 to run on real TPU hardware instead.
"""

import os
import sys

if not os.environ.get("VO_TEST_TPU"):
    flags = os.environ.get("XLA_FLAGS", "")
    if "xla_force_host_platform_device_count" not in flags:
        os.environ["XLA_FLAGS"] = (
            flags + " --xla_force_host_platform_device_count=8").strip()
    # The image's sitecustomize pins JAX_PLATFORMS=axon (real TPU via a
    # tunnel); jax.config still wins if applied before backend init.
    import jax

    jax.config.update("jax_platforms", "cpu")

# Persistent compilation cache: CPU compiles dominate suite wallclock; a
# warm cache cuts full-suite reruns by minutes.
import jax as _jax

_repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
_jax.config.update("jax_compilation_cache_dir",
                   os.path.join(_repo, ".jax_cache_cpu"))
_jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(42)


@pytest.fixture(autouse=True, scope="module")
def _drop_compiled_executables():
    """Release compiled executables between test modules.

    A long pytest process accumulates hundreds of live XLA:CPU executables;
    past a threshold the CPU backend has been observed to segfault inside
    backend_compile_and_load (deterministically at the same test when the
    whole suite runs in one process, while any subset passes). Dropping
    caches per module keeps the live-executable count bounded; the
    persistent compilation cache (above) makes re-loads cheap."""
    yield
    _jax.clear_caches()
