#!/bin/bash
# Run the test suite on a virtual 8-device CPU mesh.
#
# Default = the FAST tier: deselects tests marked `slow` (the long
# integration/e2e programs) so engine changes get feedback in minutes.
# Pass --full to run everything (CI / pre-commit for engine changes).
#
# NOTE: jax is pre-imported by site customization in some environments, so
# platform env vars MUST be set at the shell level (tests/conftest.py alone
# is not enough there).
export JAX_PLATFORMS=cpu
unset PALLAS_AXON_POOL_IPS  # prevent the axon TPU plugin from registering (and claiming the tunnel) in CPU test runs
# generous collective rendezvous timeouts: 8 virtual device threads on a
# few-core host reach all-reduces serially staggered, and XLA:CPU's default
# 40 s terminate timeout ABORTs healthy mesh tests (see tests/conftest.py —
# set here too because jax may already be imported before conftest runs)
export XLA_FLAGS="--xla_force_host_platform_device_count=8 --xla_cpu_collective_call_warn_stuck_timeout_seconds=120 --xla_cpu_collective_call_terminate_timeout_seconds=1200"

MARK=(-m "not slow")
ARGS=()
for a in "$@"; do
    if [ "$a" = "--full" ]; then MARK=(); else ARGS+=("$a"); fi
done
exec python -m pytest tests/ -x -q "${MARK[@]}" "${ARGS[@]}"
