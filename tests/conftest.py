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

jax.config.update("jax_platforms", "cpu")

assert jax.devices()[0].platform == "cpu", jax.devices()
