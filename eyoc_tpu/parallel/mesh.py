"""Data parallelism over the device mesh.

The reference has no distributed runtime at all — multi-GPU is shell-level
process fan-out (reference scripts/test_kitti.sh:45-76, SURVEY.md §2.10).
The TPU-native equivalent: `shard_map` over a 1-D `dp` mesh with the pair
batch sharded, parameters replicated, gradients `pmean`-reduced over ICI,
and BatchNorm statistics synchronized over the same axis — which makes
dp=N training statistically identical to the reference's single-process
batch of the same global size. No TP/PP: the backbone is ~9M parameters;
inventing tensor parallelism for it would burn ICI bandwidth for nothing.

Eval fan-out (the analog of the reference's 5 nohup processes) shards the
pair list across chips: `make_dp_test_step` runs the whole per-pair test
protocol on D pairs at once, one per device.

Multi-host: `maybe_distributed_init` wires `jax.distributed.initialize`
(DCN) behind --multihost; the same dp mesh then spans all hosts' chips.
"""

from __future__ import annotations

import functools
import logging

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def maybe_distributed_init(config) -> None:
    """reference has no analog; jax multi-host init behind --multihost
    (coordinator/process env come from the standard JAX env vars)."""
    if config.get("multihost", False):
        jax.distributed.initialize()
        logging.info(
            f"jax.distributed: process {jax.process_index()}/"
            f"{jax.process_count()}, {jax.local_device_count()} local devices")


def dp_device_count(config) -> int:
    """Resolve --dp_devices.

    Explicit n > 0: use exactly n (callers validate divisibility and fail
    fast). Auto (-1): use as many local devices as the batch size divides
    into evenly — a batch of 2 on an 8-device host silently runs dp=2
    rather than erroring (the reference's single-process analog always
    "fits"; auto mode must too)."""
    n = int(config.get("dp_devices", -1))
    avail = len(jax.devices())
    if n > 0:
        return min(n, avail)
    bs = int(config.get("batch_size", 1) or 1)
    d = min(avail, bs)
    while d > 1 and bs % d != 0:
        d -= 1
    return max(d, 1)


def make_mesh(num_devices: int = -1) -> Mesh:
    devices = jax.devices()
    if num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(devices, ("dp",))


def shard_batch(mesh: Mesh, batch, accum_axis: bool = False):
    """Place a RawBatch with its B axis sharded over dp.

    accum_axis=True: leaves carry a leading [iter_size] gradient-accumulation
    axis (training/steps.py:_wrap_accumulating) that stays replicated; the
    batch axis behind it is the sharded one."""
    spec = P(None, "dp") if accum_axis else P("dp")
    sharding = NamedSharding(mesh, spec)
    return jax.tree_util.tree_map(
        lambda x: jax.device_put(jnp.asarray(x), sharding), batch)


def make_dp_train_step(builder, mesh: Mesh, kind: str = "base",
                       label_mode: str = "identity"):
    """Wrap a StepBuilder train step in shard_map over the dp mesh.

    The builder MUST have been constructed with StepConfig(axis_name="dp")
    so gradients/metrics are pmean'd and BN stats psum'd inside.
    Returns step(state, batch, lr) with state replicated, batch dp-sharded.
    """
    if kind == "base":
        inner = builder.make_base_train_step(label_mode)
    elif kind == "extension":
        inner = builder.make_extension_train_step()
    else:
        raise ValueError(kind)

    state_spec = P()     # replicated
    # shard the batch axis; with iter_size accumulation the leading axis is
    # [iter_size] (replicated) and the batch axis sits behind it
    batch_spec = (P(None, "dp") if builder.cfg.iter_size > 1 else P("dp"))

    def _step(state, batch, lr):
        return inner(state, batch, lr)

    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(state_spec, batch_spec, state_spec),
        out_specs=(state_spec, state_spec),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_test_step(builder, mesh: Mesh, use_ransac: bool = False):
    """Sharded test protocol: D pairs per call, one per device — the
    TPU-native analog of the reference's 5-process eval fan-out
    (scripts/test_kitti.sh:45-76). Returns step(params, bn_state, batch,
    keys) -> {"T_est" [D,4,4], "rte" [D], "rre" [D]} with batch [D, ...]
    dp-sharded and keys [D, 2] sharded."""
    inner = builder.make_test_step(use_ransac=use_ransac)

    def _step(params, bn_state, batch, keys):
        out = inner(params, bn_state, batch, keys[0])
        return jax.tree_util.tree_map(lambda x: x[None], out)

    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_embed_step(builder, mesh: Mesh):
    """Sharded feature-extraction half of the test protocol (one pair per
    device). Split from registration so the reference's Feat/Reg timer
    surface (scripts/test_kitti.py:108-151) stays meaningful under dp."""
    inner = builder.make_embed_step()

    def _step(params, bn_state, batch):
        out = inner(params, bn_state, batch)
        return jax.tree_util.tree_map(lambda x: x[None], out)

    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(), P(), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_register_step(builder, mesh: Mesh, use_ransac: bool = False):
    """Sharded registration half: [D, ...] embedded pairs -> T_est [D,4,4]."""
    inner = builder.make_register_step(use_ransac=use_ransac)

    def _step(x0, f0, m0, x1, f1, m1, keys):
        T = inner(x0[0], f0[0], m0[0], x1[0], f1[0], m1[0], keys[0])
        return T[None]

    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P("dp"),) * 7,
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(sharded)


def make_dp_valid_step(builder, mesh: Mesh):
    """Sharded validation: D pairs per call (reference _valid_epoch runs
    batch-1 pairs serially, lib/trainer.py:1736-1826)."""
    inner = builder.make_valid_step()

    def _step(params, bn_state, batch, keys):
        out = inner(params, bn_state, batch, keys[0])
        return jax.tree_util.tree_map(lambda x: x[None], out)

    sharded = jax.shard_map(
        _step, mesh=mesh,
        in_specs=(P(), P(), P("dp"), P("dp")),
        out_specs=P("dp"),
        check_vma=False,
    )
    return jax.jit(sharded)
