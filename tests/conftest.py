"""Test config: run everything on a virtual 8-device CPU mesh.

In some environments (axon TPU tunnel) jax is pre-imported at interpreter
startup and its platform list is force-set, so env vars alone are not
enough; the CPU client is created lazily, so overriding the platform and
XLA_FLAGS here (before any computation) still works.
"""

import os

os.environ.setdefault("JAX_PLATFORMS", "cpu")
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    flags = (flags + " --xla_force_host_platform_device_count=8").strip()
# 8 virtual device threads share the host cores; on few-core hosts XLA:CPU's
# default 40 s rendezvous terminate timeout ABORTS mesh tests that are merely
# serially staggered. Give collectives a generous budget instead.
if "collective_call_terminate_timeout" not in flags:
    flags += (" --xla_cpu_collective_call_warn_stuck_timeout_seconds=120"
              " --xla_cpu_collective_call_terminate_timeout_seconds=1200")
os.environ["XLA_FLAGS"] = flags

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
