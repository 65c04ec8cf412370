"""Test config: run on a virtual 8-device CPU mesh (the standard JAX stand-in
for multi-chip TPU), so sharding tests work without real hardware."""

import os

# force-set (not setdefault): the axon sitecustomize pre-populates
# JAX_PLATFORMS=axon at interpreter start, which would silently run the test
# suite on the TPU tunnel
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = flags + " --xla_force_host_platform_device_count=8"
os.environ["JAX_PLATFORMS"] = "cpu"

import warnings  # noqa: E402

import jax  # noqa: E402  (import after env setup)

jax.config.update("jax_enable_x64", False)

if jax.default_backend() not in ("cpu",):
    # The axon sitecustomize pins the backend at interpreter start; env vars
    # set here are too late. Run the suite via scripts/test.sh (which sets
    # PALLAS_AXON_POOL_IPS= before python starts) for the CPU mesh.
    warnings.warn(
        "tests are running on the TPU tunnel, not the virtual CPU mesh; "
        "multi-device tests will be skipped - use scripts/test.sh",
        stacklevel=1,
    )
