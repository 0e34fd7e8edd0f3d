"""Generic sparse UNet — the functional core of every model variant.

One parameterized builder covers the reference's whole model zoo
(reference model/resunet.py, model/simpleunet.py):

- ResUNet2 family: residual BasicBlocks per level, k=1 bottleneck conv1_tr,
  no norm after conv1_tr (reference model/resunet.py:142-193)
- ResUNetExpanded family: two (norm, block) repeats per level
  (reference model/resunet.py:406-492)
- SimpleNet/SimpleNet2/SimpleNet3 families: 3/4/5 levels, no residual
  blocks, k=3 conv1_tr followed by norm+relu (reference model/simpleunet.py)

Parameters are plain nested dicts whose keys mirror the reference module
names (conv1, norm1, block1.{conv1,norm1,conv2,norm2}, conv4_tr, final, ...)
so a torch checkpoint maps 1:1. BatchNorm running statistics live in a
separate state pytree of the same shape.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from eyoc_tpu.sparse.conv import sparse_conv
from eyoc_tpu.sparse.norm import (
    BatchNormState,
    init_bn_state,
    masked_batch_norm,
    masked_instance_norm,
)
from eyoc_tpu.sparse.types import SparsePyramid


@dataclasses.dataclass(frozen=True)
class UNetSpec:
    name: str
    norm_type: str                      # 'BN' | 'IN' (top-level norms)
    block_norm_type: Optional[str]      # None => no residual blocks (SimpleNet)
    channels: Tuple[int, ...]           # encoder channels per level
    tr_channels: Tuple[int, ...]        # decoder channels per level
    repeats: int = 1                    # (norm, block) repeats per level (Expanded=2)
    conv1_tr_kernel: int = 1            # 1 (ResUNet) or 3 (SimpleNet)
    conv1_tr_norm: bool = False         # SimpleNet: norm+relu after conv1_tr

    @property
    def num_levels(self) -> int:
        return len(self.channels)


# ---------------------------------------------------------------- init utils


def _init_conv(key, k3: int, cin: int, cout: int):
    std = (2.0 / (k3 * cin)) ** 0.5
    return std * jax.random.normal(key, (k3, cin, cout), jnp.float32)


def _init_norm(kind: str, c: int):
    params = {"scale": jnp.ones((c,)), "bias": jnp.zeros((c,))}
    state = init_bn_state(c) if kind == "BN" else None
    return params, state


def _init_block(key, kind: str, c: int):
    k1, k2 = jax.random.split(key)
    n1p, n1s = _init_norm(kind, c)
    n2p, n2s = _init_norm(kind, c)
    params = {
        "conv1": _init_conv(k1, 27, c, c),
        "norm1": n1p,
        "conv2": _init_conv(k2, 27, c, c),
        "norm2": n2p,
    }
    state = {"norm1": n1s, "norm2": n2s}
    return params, state


def init_unet(
    spec: UNetSpec,
    key,
    in_channels: int = 1,
    out_channels: int = 32,
    conv1_kernel_size: int = 5,
):
    """Returns (params, bn_state) pytrees."""
    L = spec.num_levels
    ch = spec.channels
    tr = spec.tr_channels
    params, state = {}, {}
    keys = iter(jax.random.split(key, 64))

    def add_norm(name, c):
        p, s = _init_norm(spec.norm_type, c)
        params[name] = p
        state[name] = s

    def add_block(name, c):
        p, s = _init_block(next(keys), spec.block_norm_type, c)
        params[name] = p
        state[name] = s

    # encoder
    params["conv1"] = _init_conv(next(keys), conv1_kernel_size ** 3, in_channels, ch[0])
    add_norm("norm1", ch[0])
    if spec.block_norm_type:
        add_block("block1", ch[0])
        for r in range(2, spec.repeats + 1):
            add_norm(f"norm1_{r}", ch[0])
            add_block(f"block1_{r}", ch[0])
    for l in range(2, L + 1):
        params[f"conv{l}"] = _init_conv(next(keys), 27, ch[l - 2], ch[l - 1])
        add_norm(f"norm{l}", ch[l - 1])
        if spec.block_norm_type:
            add_block(f"block{l}", ch[l - 1])
            for r in range(2, spec.repeats + 1):
                add_norm(f"norm{l}_{r}", ch[l - 1])
                add_block(f"block{l}_{r}", ch[l - 1])

    # decoder
    for l in range(L, 1, -1):
        cin = ch[l - 1] if l == L else ch[l - 1] + tr[l]
        params[f"conv{l}_tr"] = _init_conv(next(keys), 27, cin, tr[l - 1])
        add_norm(f"norm{l}_tr", tr[l - 1])
        if spec.block_norm_type:
            add_block(f"block{l}_tr", tr[l - 1])
            for r in range(2, spec.repeats + 1):
                add_norm(f"norm{l}_tr_{r}", tr[l - 1])
                add_block(f"block{l}_tr_{r}", tr[l - 1])

    params["conv1_tr"] = _init_conv(
        next(keys), spec.conv1_tr_kernel ** 3, ch[0] + tr[1], tr[0]
    )
    if spec.conv1_tr_norm:
        add_norm("norm1_tr", tr[0])
    params["final"] = {
        "w": _init_conv(next(keys), 1, tr[0], out_channels)[0],
        "b": jnp.zeros((out_channels,)),
    }
    return params, state


# ---------------------------------------------------------------- apply


def _norm(kind, p, s, x, mask, *, training, momentum, axis_name):
    if kind == "BN":
        return masked_batch_norm(
            x, mask, p["scale"], p["bias"], s,
            momentum=momentum, training=training, axis_name=axis_name,
        )
    return masked_instance_norm(x, mask, p["scale"], p["bias"]), None


def _block(kind, p, s, x, mask, kmap, *, training, momentum, axis_name, group):
    residual = x
    out = sparse_conv(x, kmap, p["conv1"], group=group)
    out, s1 = _norm(kind, p["norm1"], s["norm1"] if s else None, out, mask,
                    training=training, momentum=momentum, axis_name=axis_name)
    out = jax.nn.relu(out)
    out = sparse_conv(out, kmap, p["conv2"], group=group)
    out, s2 = _norm(kind, p["norm2"], s["norm2"] if s else None, out, mask,
                    training=training, momentum=momentum, axis_name=axis_name)
    out = jax.nn.relu(out + residual) * mask[..., None]
    return out, ({"norm1": s1, "norm2": s2} if s else None)


def apply_unet(
    spec: UNetSpec,
    params,
    bn_state,
    pyramid: SparsePyramid,
    in_feats: jnp.ndarray | None = None,
    *,
    training: bool = False,
    bn_momentum: float = 0.05,
    axis_name: str | None = None,
    normalize_feature: bool = True,
    conv_group: int = 4,
):
    """Forward pass. pyramid: batched SparsePyramid (leading B on arrays).

    Returns (features [B, CAP_1, out_channels], new_bn_state).
    Mirrors the reference forward orders exactly
    (model/resunet.py:142-193, model/simpleunet.py:96-133).
    """
    L = spec.num_levels
    levels = pyramid.levels
    masks = [lv.mask for lv in levels]
    new_state = {}

    def norm(name, x, mask):
        y, s = _norm(spec.norm_type, params[name],
                     bn_state.get(name) if bn_state else None, x, mask,
                     training=training, momentum=bn_momentum, axis_name=axis_name)
        new_state[name] = s
        return y

    def block(name, x, mask, kmap):
        y, s = _block(spec.block_norm_type, params[name],
                      bn_state.get(name) if bn_state else None, x, mask, kmap,
                      training=training, momentum=bn_momentum,
                      axis_name=axis_name, group=conv_group)
        new_state[name] = s
        return y

    def level_tail(prefix, x, mask, kmap):
        """norm -> block (-> relu -> norm_2 -> block_2 ...) -> relu"""
        x = norm(f"norm{prefix}", x, mask)
        if spec.block_norm_type:
            x = block(f"block{prefix}", x, mask, kmap)
            for r in range(2, spec.repeats + 1):
                x = jax.nn.relu(x)
                x = norm(f"norm{prefix}_{r}", x, mask)
                x = block(f"block{prefix}_{r}", x, mask, kmap)
        return jax.nn.relu(x)

    if in_feats is None:
        B, cap1 = masks[0].shape
        in_feats = masks[0][..., None].astype(jnp.float32)

    # ---- encoder
    skips = []
    out = sparse_conv(in_feats, pyramid.conv1_map, params["conv1"], group=conv_group)
    out = level_tail("1", out, masks[0], pyramid.self_maps[0])
    skips.append(out)
    for l in range(2, L + 1):
        out = sparse_conv(out, pyramid.down_maps[l - 2], params[f"conv{l}"], group=conv_group)
        out = level_tail(str(l), out, masks[l - 1], pyramid.self_maps[l - 1])
        skips.append(out)

    # ---- decoder
    out = skips[-1]
    for l in range(L, 1, -1):
        out = sparse_conv(out, pyramid.up_maps[l - 2], params[f"conv{l}_tr"], group=conv_group)
        out = level_tail(f"{l}_tr", out, masks[l - 2], pyramid.self_maps[l - 2])
        # ME.cat(out_tr, out_enc): decoder features first
        out = jnp.concatenate([out, skips[l - 2]], axis=-1)

    # conv1_tr on the concatenated stride-1 tensor
    if spec.conv1_tr_kernel == 1:
        out = jnp.einsum("bnc,cd->bnd", out, params["conv1_tr"][0])
    else:
        out = sparse_conv(out, pyramid.self_maps[0], params["conv1_tr"], group=conv_group)
    if spec.conv1_tr_norm:
        out = norm("norm1_tr", out, masks[0])
    out = jax.nn.relu(out)

    out = jnp.einsum("bnc,cd->bnd", out, params["final"]["w"]) + params["final"]["b"]
    out = out * masks[0][..., None]

    if normalize_feature:
        out = out / (jnp.linalg.norm(out, axis=-1, keepdims=True) + 1e-12)
        out = out * masks[0][..., None]
    return out, new_state
