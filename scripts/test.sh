#!/bin/bash
# Twin of reference scripts/test.sh. PALLAS_AXON_POOL_IPS= disables the axon
# TPU plugin (its sitecustomize otherwise pins the backend to the tunnel);
# tests run on an 8-device virtual CPU mesh.
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu \
XLA_FLAGS="--xla_force_host_platform_device_count=8" \
OPENCV_IO_ENABLE_OPENEXR=1 python -m pytest -s tests/
