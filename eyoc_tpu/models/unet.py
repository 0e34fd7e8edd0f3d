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

from eyoc_tpu.sparse import brick_conv
from eyoc_tpu.sparse.brick_conv import (
    conv1x1,
    conv_down,
    conv_same,
    conv_up,
    fb_concat,
    fb_to_vox,
    occ_mask,
    vox_to_fb,
)
from eyoc_tpu.sparse.bricks import BrickPyramid
from eyoc_tpu.sparse.norm import (
    BatchNormState,
    init_bn_state,
    masked_batch_norm_fb,
    masked_instance_norm_fb,
)


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


def _norm(kind, p, s, fb, level, *, training, momentum, axis_name,
          out_dtype=None, n_clouds=None):
    """fb [NB, 8C] any float dtype -> (y [NB, 8C] out_dtype, new_state).

    Stats semantics match MinkowskiBatchNorm / InstanceNorm over valid
    voxels (reference model/common.py:4-10); computed in f32, stored in the
    activation dtype."""
    NB = level.bkeys.shape[0]
    occ8 = level.occ.reshape(NB, 8)
    if kind == "BN":
        return masked_batch_norm_fb(
            fb, occ8, p["scale"], p["bias"], s,
            momentum=momentum, training=training, axis_name=axis_name,
            out_dtype=out_dtype,
        )
    # IN: MinkowskiInstanceNorm is PER-CLOUD (reference model/common.py:
    # 8-10). With the static cloud count threaded through (n_clouds),
    # statistics are per (cloud, channel) via the level's bseg row map; no
    # cross-device reduction (each cloud lives on one device under dp).
    if n_clouds is not None:
        y = masked_instance_norm_fb(
            fb, occ8, level.bseg, n_clouds, p["scale"], p["bias"],
            out_dtype=out_dtype)
        return y, None
    # Fallback (n_clouds unknown): whole-fold statistics — exact only at
    # B == 1; callers in this repo always pass n_clouds.
    from eyoc_tpu.sparse.norm import BatchNormState as _BNS
    dummy = _BNS(jnp.zeros_like(p["scale"]), jnp.ones_like(p["scale"]))
    y, _ = masked_batch_norm_fb(
        fb, occ8, p["scale"], p["bias"], dummy,
        momentum=0.0, training=True, axis_name=axis_name,
        out_dtype=out_dtype,
    )
    return y, None


def _bn_fold(p, s, eps: float = 1e-5):
    """BN affine as (per-channel weight scale g, output bias b):
    BN(x) = x*g + b with g = scale*rsqrt(var+eps), b = bias - mean*g."""
    g = p["scale"] * jax.lax.rsqrt(s.var + eps)
    return g, p["bias"] - s.mean * g


def _block(kind, p, s, fb, level, *, training, momentum, axis_name,
           folded=False, n_clouds=None):
    """Residual BasicBlock (reference model/residual_block.py:9-77):
    conv3-norm-relu-conv3-norm + skip, relu. fb [NB, 8C] bf16.

    folded=True (eval-only): the BN affines are folded into the conv
    weights/biases, so each conv runs one fused epilogue instead of a
    separate [NB, 8C] BN pass."""
    residual = fb
    if folded:
        g1, b1 = _bn_fold(p["norm1"], s["norm1"])
        g2, b2 = _bn_fold(p["norm2"], s["norm2"])
        out = conv_same(fb, level, p["conv1"] * g1, bias=b1)
        out = jax.nn.relu(out)
        out = conv_same(out, level, p["conv2"] * g2, bias=b2)
        # both operands are pad-masked, so relu(out + residual) stays zero
        # at pad cells — no extra mask pass needed
        return jax.nn.relu(out + residual), None
    out = conv_same(fb, level, p["conv1"], mask_output=False)
    out, s1 = _norm(kind, p["norm1"], s["norm1"] if s else None, out, level,
                    training=training, momentum=momentum, axis_name=axis_name,
                    out_dtype=brick_conv.DTYPE, n_clouds=n_clouds)
    out = jax.nn.relu(out)
    out = conv_same(out, level, p["conv2"], mask_output=False)
    out, s2 = _norm(kind, p["norm2"], s["norm2"] if s else None, out, level,
                    training=training, momentum=momentum, axis_name=axis_name,
                    out_dtype=brick_conv.DTYPE, n_clouds=n_clouds)
    out = jax.nn.relu(out + residual)
    C = out.shape[1] // 8
    out = out * occ_mask(level, C, out.dtype)
    return out, ({"norm1": s1, "norm2": s2} if s else None)


def can_fold_bn(spec: UNetSpec) -> bool:
    """Eval-time BN folding applies when every norm directly follows a conv
    and is a BatchNorm: plain-BN specs with repeats == 1 (the Expanded
    variants interleave a norm after a relu, which is not a conv affine)."""
    return (spec.norm_type == "BN" and spec.repeats == 1
            and spec.block_norm_type in (None, "BN"))


def apply_unet(
    spec: UNetSpec,
    params,
    bn_state,
    pyramid: BrickPyramid,
    in_feats: jnp.ndarray | None = None,
    *,
    conv1_kernel_size: int = 5,
    training: bool = False,
    bn_momentum: float = 0.05,
    axis_name: str | None = None,
    normalize_feature: bool = True,
    fold_bn: bool = True,
    n_clouds: int | None = None,
):
    """Forward pass over a BrickPyramid (brick engine, sparse/brick_conv.py).

    in_feats: optional [M0, Cin] voxel-layout input features (e.g. jittered
    occupancy); defaults to all-ones occupancy (reference lib/trainer.py:42).
    Returns (features [M0, out_channels] f32, new_bn_state). Forward order
    mirrors the reference exactly (model/resunet.py:142-193,
    model/simpleunet.py:96-133), including SimpleNet's pre-relu skips.

    fold_bn: at eval (training=False) on foldable specs (can_fold_bn), BN
    affines are folded into conv weights/biases so each conv+BN runs as a
    single fused epilogue — numerically identical up to bf16 rounding,
    ~30% fewer full-tensor elementwise passes.
    """
    L = spec.num_levels
    levels = pyramid.levels
    assert len(levels) >= L, "pyramid shallower than the model"
    new_state = {}
    folded = (fold_bn and not training and bn_state is not None
              and can_fold_bn(spec))

    def norm(name, fb, level, out_dtype=None):
        y, s = _norm(spec.norm_type, params[name],
                     bn_state.get(name) if bn_state else None, fb, level,
                     training=training, momentum=bn_momentum,
                     axis_name=axis_name, out_dtype=out_dtype,
                     n_clouds=n_clouds)
        new_state[name] = s
        return y

    def block(name, fb, level):
        y, s = _block(spec.block_norm_type, params[name],
                      bn_state.get(name) if bn_state else None, fb, level,
                      training=training, momentum=bn_momentum,
                      axis_name=axis_name, folded=folded, n_clouds=n_clouds)
        new_state[name] = s
        return y

    def fold_of(name):
        """(weight scale, bias) of BN `name` when folding, else (None, None)."""
        if not folded:
            return None, None
        return _bn_fold(params[name], bn_state[name])

    def level_tail(prefix, fb, level):
        """norm (-> block [-> relu -> norm_2 -> block_2]...) .

        Returns (post_relu bf16, skip bf16) where skip follows the reference:
        block output for ResUNet families, PRE-relu norm output for
        SimpleNet (reference model/simpleunet.py:97-99 vs resunet.py:142-146).
        When folded, `fb` already carries the norm affine (folded into the
        producing conv) — the norm step is skipped.
        """
        if spec.block_norm_type:
            x = fb if folded else norm(f"norm{prefix}", fb, level,
                                       out_dtype=brick_conv.DTYPE)
            x = block(f"block{prefix}", x, level)
            for r in range(2, spec.repeats + 1):
                x = norm(f"norm{prefix}_{r}", jax.nn.relu(x), level,
                         out_dtype=brick_conv.DTYPE)
                x = block(f"block{prefix}_{r}", x, level)
            return x, x  # block already ends in relu
        x = fb if folded else norm(f"norm{prefix}", fb, level,
                                   out_dtype=brick_conv.DTYPE)
        skip = x                                     # pre-relu (SimpleNet)
        post = jax.nn.relu(x)
        return post, skip

    lvl0 = levels[0]
    NB0 = lvl0.bkeys.shape[0]
    if in_feats is None:
        fb0 = lvl0.occ.reshape(NB0, 8).astype(brick_conv.DTYPE)
    else:
        fb0 = vox_to_fb(lvl0, in_feats.astype(brick_conv.DTYPE))

    def enc_conv(W, normname, fb, level, k=3):
        g, b = fold_of(normname)
        return conv_same(fb, level, W if g is None else W * g, k=k, bias=b,
                         mask_output=folded)

    # ---- encoder
    skips = []
    out = enc_conv(params["conv1"], "norm1", fb0, lvl0, k=conv1_kernel_size)
    out, skip = level_tail("1", out, lvl0)
    skips.append(skip)
    for l in range(2, L + 1):
        g, b = fold_of(f"norm{l}")
        W = params[f"conv{l}"]
        out = conv_down(out, levels[l - 2], levels[l - 1],
                        W if g is None else W * g, bias=b,
                        mask_output=folded)
        out, skip = level_tail(str(l), out, levels[l - 1])
        skips.append(skip)

    # ---- decoder
    for l in range(L, 1, -1):
        g, b = fold_of(f"norm{l}_tr")
        W = params[f"conv{l}_tr"]
        out = conv_up(out, levels[l - 2], W if g is None else W * g, bias=b,
                      mask_output=folded)
        out, _ = level_tail(f"{l}_tr", out, levels[l - 2])
        # ME.cat(out_tr, out_enc): decoder features first
        out = fb_concat(out, spec.tr_channels[l - 1], skips[l - 2],
                        spec.channels[l - 2])

    # conv1_tr on the concatenated stride-1 tensor
    if spec.conv1_tr_kernel == 1:
        out = conv1x1(out, params["conv1_tr"][0], level=lvl0)
    else:
        g, b = fold_of("norm1_tr") if spec.conv1_tr_norm else (None, None)
        W = params["conv1_tr"]
        out = conv_same(out, lvl0, W if g is None else W * g, bias=b,
                        mask_output=True)
    if spec.conv1_tr_norm and not folded:
        out = norm("norm1_tr", out, lvl0, out_dtype=brick_conv.DTYPE)
    out = jax.nn.relu(out)

    out = conv1x1(out, params["final"]["w"], bias=params["final"]["b"],
                  level=lvl0)

    # back to voxel layout
    feats = fb_to_vox(lvl0, out, out.shape[1] // 8)
    if normalize_feature:
        feats = feats / (jnp.linalg.norm(feats, axis=-1, keepdims=True) + 1e-12)
    return feats, new_state
