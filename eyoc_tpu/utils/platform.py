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


def apply_platform_env(config=None) -> None:
    import jax

    env_plat = os.environ.get("JAX_PLATFORMS", "")
    cfg_plat = str(getattr(jax.config, "jax_platforms", "") or "")
    if env_plat and env_plat != cfg_plat:
        jax.config.update("jax_platforms", env_plat)
    # --matmul_precision (DESIGN.md: fp32 by default, bf16 opt-in). The
    # numerically-critical kernels pin Precision.HIGHEST inline regardless
    # (pdist2 / transform_points / Kabsch / IRLS / power iteration — see
    # the round-4 bf16 root-cause notes); this sets the default for
    # everything else. The conv engine is unaffected either way: its
    # operands are explicitly bf16 (sparse/brick_conv.set_compute_dtype).
    prec = (config or {}).get("matmul_precision", "highest")
    if prec and prec != "default":
        jax.config.update("jax_default_matmul_precision",
                          {"bfloat16": "bfloat16", "highest": "highest"}[prec])
