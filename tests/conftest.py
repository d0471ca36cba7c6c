"""Test harness setup: force an 8-device virtual CPU mesh before JAX import.

Tests run on CPU with float64 enabled so numerical checks are tight; the
library itself is dtype-preserving, so production float32 paths are
exercised by passing float32 inputs explicitly.
"""

import os

os.environ["JAX_PLATFORMS"] = "cpu"
_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in _flags:
    os.environ["XLA_FLAGS"] = (_flags + " --xla_force_host_platform_device_count=8").strip()

import jax
import pytest

# The axon TPU plugin (sitecustomize) prepends itself to jax_platforms at
# interpreter start, overriding the env var — force CPU via the config.
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compile cache: the suite is compile-bound (hundreds of large
# fused programs); cached executables cut repeat full-suite runs from
# ~20+ min to minutes.  In-memory caches are still cleared per module
# (below) to bound host RAM.
jax.config.update(
    "jax_compilation_cache_dir",
    os.path.join(os.path.dirname(os.path.abspath(__file__)), "..",
                 ".jax_cache_tests"))
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.5)


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Free compiled executables between test modules: the full suite
    compiles hundreds of large programs and otherwise exhausts host RAM
    (observed as a faulthandler crash mid-suite)."""
    yield
    jax.clear_caches()
