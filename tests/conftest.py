"""Test configuration: run everything on a virtual 8-device CPU mesh.

The axon sitecustomize registers a single-chip TPU backend and pins
jax_platforms; tests override it back to CPU (with 8 virtual devices for
sharding tests) before any backend is initialized.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "xla_force_host_platform_device_count" not in os.environ.get("XLA_FLAGS", ""):
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
