"""Apply JAX platform environment overrides at CLI startup.

In some environments (e.g. the axon TPU tunnel) jax is pre-imported at
interpreter startup with a force-set backend, so JAX_PLATFORMS /
--xla_force_host_platform_device_count env vars set by the launcher are
silently ignored. CLIs call this before touching devices so `python
JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 -m
eyoc_tpu.cli.train --dp_devices 8` behaves the same everywhere.
"""

from __future__ import annotations

import os


def apply_platform_env() -> None:
    import jax

    env_plat = os.environ.get("JAX_PLATFORMS", "")
    cfg_plat = str(getattr(jax.config, "jax_platforms", "") or "")
    if env_plat and env_plat != cfg_plat:
        jax.config.update("jax_platforms", env_plat)
