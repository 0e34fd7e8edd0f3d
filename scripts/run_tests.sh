#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
# NOTE: jax is pre-imported by site customization in some environments, so
# platform env vars MUST be set at the shell level (tests/conftest.py alone
# is not enough there).
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS  # prevent the axon TPU plugin from registering (and claiming the tunnel) in CPU test runs
export XLA_FLAGS="--xla_force_host_platform_device_count=8"
exec python -m pytest tests/ -x -q "$@"
