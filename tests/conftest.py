"""Test harness: force an 8-virtual-device CPU mesh.

The container's sitecustomize registers the axon TPU backend and sets
``jax_platforms='axon,cpu'`` at interpreter start, overriding JAX_PLATFORMS.
Tests must run on a virtual CPU mesh (fast, 8 devices for sharding tests), so
we re-point the config before any backend is used. bench.py runs on the real
chip instead.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

# Optional persistent compilation cache (opt-in via DSC_TEST_CACHE=path).
# NOT enabled by default: on this image the cache *write* path segfaults
# (jax compilation_cache.put_executable_and_time — reproduced twice on
# different programs), which is worse than the rare cumulative-compile
# crash it was meant to work around. Split long runs per test file instead.
if os.environ.get("DSC_TEST_CACHE"):
    jax.config.update("jax_compilation_cache_dir",
                      os.environ["DSC_TEST_CACHE"])
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)

from jax._src import xla_bridge as _xb  # noqa: E402

if _xb.backends_are_initialized():  # pragma: no cover
    from jax.extend.backend import clear_backends

    clear_backends()

import pytest  # noqa: E402

# Decouple tests from wall-clock load: inference()'s default watchdog is the
# reference's 360 s (registry.INFERENCE_TIMEOUT_S, bound as a default arg at
# api-import time). Heavy CPU e2e tests legitimately exceed it when the
# 1-CPU box is contended (observed: two suites overlapping -> 2 spurious
# TimeoutErrors). Raise the default BEFORE any test module imports the app
# layer; tests that exercise the watchdog pass an explicit tiny timeout.
from diffusionspatialcontrol_tpu import registry as _registry  # noqa: E402

_registry.INFERENCE_TIMEOUT_S = 36000


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_per_module():
    """Cap cumulative XLA:CPU compile state. The full single-process suite
    segfaults inside backend_compile after ~200+ tests' worth of compiled
    programs (reproduced twice at tests/test_conditioning.py hires tests;
    every test passes in isolation). Dropping the in-memory executable
    caches between modules keeps the native heap bounded. Prefer
    ``pytest -n 4 --dist loadfile`` (xdist, per-file workers), which
    sidesteps the accumulation entirely and is ~3x faster."""
    yield
    import jax

    jax.clear_caches()
