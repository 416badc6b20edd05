"""Test configuration: run on a virtual 8-device CPU mesh with float64
available, so multi-chip sharding logic is exercised without TPU hardware
and solver/spline oracles can be checked at tight tolerance.

Note: pytest plugins import jax before this conftest runs, so the platform
must be forced through jax.config (the JAX_PLATFORMS env var alone is read
too early to override here).  The surrounding environment may pin
JAX_PLATFORMS to a TPU backend (e.g. axon) — tests must not ride the device
tunnel."""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)

# Persistent compilation cache: the suite is compile-bound (many distinct
# jitted shapes x 8 virtual devices); repeat runs hit the cache on disk.
_cache_dir = os.path.join(os.path.dirname(__file__), ".jax_cache")
jax.config.update("jax_compilation_cache_dir", _cache_dir)
# 0.02s threshold: the suite is dominated by a long tail of SMALL
# compiles that higher thresholds recompiled every run — measured warm
# full-suite: 0.5s threshold ~520 s, 0.1s ~480 s, 0.02s ~322 s (the cold
# write pass once costs ~17 min; the cache persists on disk).
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.02)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

assert jax.default_backend() == "cpu", jax.default_backend()
assert jax.device_count() == 8, jax.devices()

import gc  # noqa: E402

import pytest  # noqa: E402


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Cap process growth over the 200+-test run: the accumulated jit/
    tracing caches make late modules run 1.6-3x slower than isolated
    (measured).  Dropping them at module boundaries keeps per-test cost at
    its isolated level; the persistent disk cache absorbs any recompiles of
    helpers shared across modules."""
    yield
    jax.clear_caches()
    gc.collect()
