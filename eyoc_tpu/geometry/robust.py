"""IRLS robust pose estimation (validation-time solver).

Re-implements the semantics of the reference's `est_quad_linear_robust`
(reference: util/transform_estimation.py:56-116): 20 iterations of a
small-angle linearized 6-DoF solve with weights `par / (||r|| + par)` and
`par` halved every 5 iterations — but fully on-device, statically shaped,
with a validity mask instead of variable-length inputs, and the 3Nx6 linear
system folded directly into 6x6 normal equations.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from eyoc_tpu.geometry.se3 import rot_x, rot_y, rot_z


def _small_angle_trans(x: jnp.ndarray) -> jnp.ndarray:
    """x: [6] twist (rx, ry, rz, tx, ty, tz) -> 4x4 (reference get_trans)."""
    # HIGHEST: bf16 rotation-compose entries carry ~4e-3 rad of noise —
    # at the RRE 5 deg (0.087 rad) success scale, not free
    R = jnp.matmul(
        jnp.matmul(rot_z(x[2]), rot_y(x[1]),
                   precision=jax.lax.Precision.HIGHEST),
        rot_x(x[0]), precision=jax.lax.Precision.HIGHEST)
    T = jnp.eye(4, dtype=x.dtype)
    T = T.at[:3, :3].set(R)
    T = T.at[:3, 3].set(x[3:6])
    return T


def _normal_equations(pts0, pts1, w):
    """Weighted normal equations of the reference's linear system.

    Row blocks (reference util/transform_estimation.py:56-75):
      A0 = [0,  z, -y, 1, 0, 0];  b0 = x1 - x0
      A1 = [-z, 0,  x, 0, 1, 0];  b1 = y1 - y0
      A2 = [y, -x,  0, 0, 0, 1];  b2 = z1 - z0
    each row scaled by w (so w^2 enters the normal equations).
    """
    n = pts0.shape[0]
    x, y, z = pts0[:, 0], pts0[:, 1], pts0[:, 2]
    zero = jnp.zeros_like(x)
    one = jnp.ones_like(x)
    J = jnp.stack(
        [
            jnp.stack([zero, z, -y, one, zero, zero], -1),
            jnp.stack([-z, zero, x, zero, one, zero], -1),
            jnp.stack([y, -x, zero, zero, zero, one], -1),
        ],
        axis=1,
    )  # [n, 3, 6]
    r = pts1 - pts0  # [n, 3]
    w2 = (w * w)[:, None, None]
    # HIGHEST: coordinate-scale Jacobian products; bf16 accumulation
    # noise shifts the normal-equations solution by decimeters
    M = jnp.einsum("nki,nkj->ij", J * w2, J,
                   precision=jax.lax.Precision.HIGHEST)
    v = jnp.einsum("nki,nk->i", J * w2, r,
                   precision=jax.lax.Precision.HIGHEST)
    return M, v


def est_quad_linear_robust(
    pts0: jnp.ndarray,
    pts1: jnp.ndarray,
    weight: jnp.ndarray | None = None,
    mask: jnp.ndarray | None = None,
    num_iters: int = 20,
) -> jnp.ndarray:
    """IRLS pose: returns 4x4 trans with pts1 ~ trans(pts0).

    pts0/pts1: [N, 3]; weight: [N] initial weights; mask: [N] validity.
    """
    pts0 = pts0.astype(jnp.float32)
    pts1 = pts1.astype(jnp.float32)
    n = pts0.shape[0]
    if weight is None:
        weight = jnp.ones((n,), jnp.float32)
    weight = jnp.reshape(weight, (n,))
    if mask is not None:
        weight = jnp.where(mask, weight, 0.0)
        valid = mask.astype(jnp.float32)
    else:
        valid = jnp.ones((n,), jnp.float32)

    def body(i, carry):
        pts0_curr, w, trans, par = carry
        par = jnp.where((i > 0) & (i % 5 == 0), par / 2.0, par)
        M, v = _normal_equations(pts0_curr, pts1, w)
        # Tikhonov epsilon keeps degenerate (fully masked) systems finite.
        x = jnp.linalg.solve(M + 1e-6 * jnp.eye(6, dtype=M.dtype), v)
        trans_curr = _small_angle_trans(x)
        pts0_curr = jnp.matmul(
            pts0_curr, trans_curr[:3, :3].T,
            precision=jax.lax.Precision.HIGHEST) + trans_curr[:3, 3]
        w = par / (jnp.linalg.norm(pts0_curr - pts1, axis=1) + par) * valid
        # HIGHEST: the 4x4 compose carries LiDAR-scale translations
        trans = jnp.matmul(trans_curr, trans,
                           precision=jax.lax.Precision.HIGHEST)
        return pts0_curr, w, trans, par

    carry = (pts0, weight, jnp.eye(4, dtype=jnp.float32), jnp.float32(1.0))
    carry = jax.lax.fori_loop(0, num_iters, body, carry)
    return carry[2]
