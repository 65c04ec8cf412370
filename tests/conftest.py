"""Test config: run on a virtual 8-device CPU mesh (the standard JAX stand-in
for multi-chip TPU), so sharding tests work without real hardware."""

import os

os.environ.setdefault("XLA_FLAGS", "--xla_force_host_platform_device_count=8")
os.environ.setdefault("JAX_PLATFORMS", "cpu")

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)
