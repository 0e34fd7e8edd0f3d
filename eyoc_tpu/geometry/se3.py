"""SE(3) rigid-transform utilities (pure jax, batched).

Semantics match the reference's SE3 helpers (reference:
scripts/SC2_PCR/utils/SE3.py:43-112 and util/transform_estimation.py:16-54),
re-derived for arbitrary leading batch dimensions.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def transform_points(pts: jnp.ndarray, trans: jnp.ndarray) -> jnp.ndarray:
    """Apply a 4x4 rigid transform to points.

    pts:   [..., N, 3]
    trans: [..., 4, 4]
    returns [..., N, 3]
    """
    R = trans[..., :3, :3]
    t = trans[..., :3, 3]
    # HIGHEST: on TPU the default f32 matmul runs bf16 operands; at LiDAR
    # coordinate scale (~80 m) that is +-0.3 m of noise on warped points —
    # catastrophic for every radius check downstream (round-4 root cause
    # of the half-wrong GT positives, PERF_NOTES round-4 session B). K=3
    # matmuls are bandwidth-bound; exactness here is free.
    return jnp.matmul(pts, jnp.swapaxes(R, -1, -2),
                      precision=jax.lax.Precision.HIGHEST) + t[..., None, :]


def integrate_trans(R: jnp.ndarray, t: jnp.ndarray) -> jnp.ndarray:
    """Assemble [..., 4, 4] from rotation [..., 3, 3] and translation.

    Accepts t as [..., 3], [..., 3, 1] or [..., 1, 3].
    """
    t = jnp.reshape(t, t.shape[: R.ndim - 2] + (3,))
    batch = R.shape[:-2]
    eye = jnp.broadcast_to(jnp.eye(4, dtype=R.dtype), batch + (4, 4))
    out = eye.at[..., :3, :3].set(R)
    out = out.at[..., :3, 3].set(t)
    return out


def decompose_trans(trans: jnp.ndarray):
    return trans[..., :3, :3], trans[..., :3, 3]


def inverse_trans(trans: jnp.ndarray) -> jnp.ndarray:
    R, t = decompose_trans(trans)
    Rt = jnp.swapaxes(R, -1, -2)
    return integrate_trans(Rt, -(Rt @ t[..., None])[..., 0])


def rotation_from_axis_angle(axis: jnp.ndarray, angle: jnp.ndarray) -> jnp.ndarray:
    """Rodrigues formula. axis [..., 3] (need not be unit), angle [...]."""
    axis = axis / (jnp.linalg.norm(axis, axis=-1, keepdims=True) + 1e-12)
    x, y, z = axis[..., 0], axis[..., 1], axis[..., 2]
    zeros = jnp.zeros_like(x)
    K = jnp.stack(
        [
            jnp.stack([zeros, -z, y], axis=-1),
            jnp.stack([z, zeros, -x], axis=-1),
            jnp.stack([-y, x, zeros], axis=-1),
        ],
        axis=-2,
    )
    s = jnp.sin(angle)[..., None, None]
    c = jnp.cos(angle)[..., None, None]
    eye = jnp.eye(3, dtype=axis.dtype)
    return eye + s * K + (1.0 - c) * (K @ K)


def rot_x(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([o, z, z], -1),
            jnp.stack([z, c, -s], -1),
            jnp.stack([z, s, c], -1),
        ],
        -2,
    )


def rot_y(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, z, s], -1),
            jnp.stack([z, o, z], -1),
            jnp.stack([-s, z, c], -1),
        ],
        -2,
    )


def rot_z(theta: jnp.ndarray) -> jnp.ndarray:
    c, s = jnp.cos(theta), jnp.sin(theta)
    z, o = jnp.zeros_like(c), jnp.ones_like(c)
    return jnp.stack(
        [
            jnp.stack([c, -s, z], -1),
            jnp.stack([s, c, z], -1),
            jnp.stack([z, z, o], -1),
        ],
        -2,
    )
