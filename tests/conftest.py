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
    os.environ["XLA_FLAGS"] = (
        flags + " --xla_force_host_platform_device_count=8"
    ).strip()

import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_default_matmul_precision", "highest")
