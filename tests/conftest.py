"""Test configuration: force the CPU backend with 8 virtual devices.

The container's sitecustomize registers the axon TPU plugin and pins
JAX_PLATFORMS=axon; tests must run on the host CPU (with a virtual 8-device
mesh for the sharding tests), so we override the platform before any backend
is instantiated.
"""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
if "--xla_force_host_platform_device_count" not in os.environ["XLA_FLAGS"]:
    os.environ["XLA_FLAGS"] += " --xla_force_host_platform_device_count=8"

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
