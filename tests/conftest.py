"""Test configuration: force CPU with 8 virtual devices so sharding tests
run without TPU hardware (the real-chip bench path is exercised by bench.py,
not pytest).

The container preloads jax in sitecustomize with JAX_PLATFORMS=axon (the
TPU tunnel), so mutating os.environ here is too late; override the jax
config directly before any backend initializes.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ["JAX_PLATFORMS"] = "cpu"

import jax  # noqa: E402
import pytest  # noqa: E402

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()


@pytest.fixture(autouse=True, scope="module")
def _clear_jax_caches_between_modules():
    """Drop compiled executables after every test module.

    One pytest process compiling the whole suite (~230 tests) segfaults
    inside XLA:CPU backend_compile_and_load after ~200 in-process
    compilations (full faulthandler trace in VERDICT r4 weak #2; the
    persistent on-disk cache makes re-loads cheap, so clearing costs
    little).  scripts/run_tests.py additionally runs the suite as bounded
    subprocess groups -- the documented one-command green run."""
    yield
    jax.clear_caches()
