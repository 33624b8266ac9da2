"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Multi-device tests use the fake-mesh pattern the reference entirely lacks
(SURVEY.md section 4): XLA_FLAGS=--xla_force_host_platform_device_count=8.

NOTE: this environment force-registers a TPU ('axon') backend from
sitecustomize and pins JAX_PLATFORMS=axon, so plain env vars are not
enough — jax.config.update('jax_platforms', 'cpu') after import is what
actually selects the CPU backend for tests.
"""

import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()
os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", "/root/.jax_cache")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_ENTRY_SIZE_BYTES", "0")
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "1")

import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
