import os

# Force CPU with 8 virtual devices (multi-chip sharding tests) and x64 for
# parity with the float64 PyTorch reference. NOTE: in this image the axon TPU
# plugin ignores the JAX_PLATFORMS env var, so the platform must be forced
# through jax.config before any backend initialization.
xla_flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in xla_flags:
    os.environ["XLA_FLAGS"] = (
        xla_flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
# persistent compiled-executable cache: rollout-grad graphs take minutes to
# compile on CPU x64; repeat suite runs hit the disk cache instead
jax.config.update("jax_compilation_cache_dir", "/tmp/jaxcache-tests")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)

assert jax.default_backend() == "cpu"


import pytest


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches():
    """Free compiled executables between test modules — the XLA CPU compiler
    has segfaulted from memory pressure ~90 compiles into a full-suite run."""
    yield
    jax.clear_caches()
