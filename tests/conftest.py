"""Test configuration: force the CPU backend with 8 virtual devices.

The axon TPU plugin overrides JAX_PLATFORMS, so the platform must be forced
via jax.config before any backend initialization.  The 8 virtual CPU devices
stand in for a TPU slice in sharding tests.
"""

import os

os.environ["XLA_FLAGS"] = (
    "--xla_force_host_platform_device_count=8 " + os.environ.get("XLA_FLAGS", "")
)

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
