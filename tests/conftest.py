"""Test harness: CPU backend with 8 virtual devices, float64 enabled.

Multi-device tests use the fake-mesh pattern the reference entirely lacks
(SURVEY.md section 4): XLA_FLAGS=--xla_force_host_platform_device_count=8.
Must run before jax initializes a backend.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_enable_x64", True)
