"""Device-resident small-matrix eigendecomposition and weighted Kabsch.

The reference computes its weighted Procrustes solution with `torch.svd` **on
the CPU**, a device->host->device sync in the middle of the registration hot
loop (reference: scripts/SC2_PCR/common.py:7-45, the `.cpu()` at line 36).
Here the solve is fully on-device and vmappable:

- `jacobi_eigh`: fixed-sweep cyclic Jacobi eigendecomposition for symmetric
  3x3 / 4x4 matrices (static shapes, branchless, batched via vmap).
- `kabsch`: weighted rigid alignment via Horn's quaternion method (the leading
  eigenvector of the 4x4 profile matrix). For non-degenerate inputs this is
  the same optimum as SVD-Kabsch with determinant correction, but it always
  returns a *proper* rotation without a reflection branch.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_JACOBI_SWEEPS = 8


def _cyclic_pairs(n: int):
    return [(p, q) for p in range(n - 1) for q in range(p + 1, n)]


@functools.partial(jax.jit, static_argnames=("sweeps",))
def jacobi_eigh(A: jnp.ndarray, sweeps: int = _JACOBI_SWEEPS):
    """Eigendecomposition of a symmetric [..., n, n] matrix (n small & static).

    Returns (eigenvalues [..., n], eigenvectors [..., n, n]) with eigenvectors
    in columns; NOT sorted.
    """
    n = A.shape[-1]
    batch = A.shape[:-2]
    A = A.astype(jnp.float32)
    V = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), batch + (n, n))

    def rotate(carry, pq):
        A, V = carry
        p, q = pq
        apq = A[..., p, q]
        app = A[..., p, p]
        aqq = A[..., q, q]
        # Branchless Givens angle; when apq ~ 0 the rotation is identity.
        small = jnp.abs(apq) < 1e-30
        tau = (aqq - app) / jnp.where(small, 1.0, 2.0 * apq)
        t = jnp.sign(tau) / (jnp.abs(tau) + jnp.sqrt(1.0 + tau * tau))
        t = jnp.where(small, 0.0, t)
        c = 1.0 / jnp.sqrt(1.0 + t * t)
        s = t * c
        eye = jnp.broadcast_to(jnp.eye(n, dtype=A.dtype), batch + (n, n))
        G = eye.at[..., p, p].set(c)
        G = G.at[..., q, q].set(c)
        G = G.at[..., p, q].set(s)
        G = G.at[..., q, p].set(-s)
        A = jnp.swapaxes(G, -1, -2) @ A @ G
        V = V @ G
        return (A, V), None

    pairs = _cyclic_pairs(n) * sweeps
    for pq in pairs:
        (A, V), _ = rotate((A, V), pq)
    return jnp.diagonal(A, axis1=-2, axis2=-1), V


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3]."""
    q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-12)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - z * w)
    r02 = 2 * (x * z + y * w)
    r10 = 2 * (x * y + z * w)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - x * w)
    r20 = 2 * (x * z - y * w)
    r21 = 2 * (y * z + x * w)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def _horn_profile_matrix(H: jnp.ndarray) -> jnp.ndarray:
    """4x4 symmetric profile matrix of the 3x3 cross-covariance H = sum w a bᵀ."""
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]
    r0 = jnp.stack([Sxx + Syy + Szz, Syz - Szy, Szx - Sxz, Sxy - Syx], -1)
    r1 = jnp.stack([Syz - Szy, Sxx - Syy - Szz, Sxy + Syx, Szx + Sxz], -1)
    r2 = jnp.stack([Szx - Sxz, Sxy + Syx, -Sxx + Syy - Szz, Syz + Szy], -1)
    r3 = jnp.stack([Sxy - Syx, Szx + Sxz, Syz + Szy, -Sxx - Syy + Szz], -1)
    return jnp.stack([r0, r1, r2, r3], -2)


def kabsch(
    A: jnp.ndarray,
    B: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_threshold: float = 0.0,
) -> jnp.ndarray:
    """Weighted rigid alignment: returns trans [..., 4, 4] with B ~ trans(A).

    A, B: [..., N, 3]; weights: [..., N] (pad rows -> weight 0).
    Semantics mirror the reference `rigid_transform_3d`
    (scripts/SC2_PCR/common.py:7-45) without the CPU round trip.
    """
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(A.shape[:-1], dtype=jnp.float32)
    weights = jnp.where(weights < weight_threshold, 0.0, weights)
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-6
    centroid_A = jnp.sum(A * weights[..., None], axis=-2) / wsum
    centroid_B = jnp.sum(B * weights[..., None], axis=-2) / wsum
    Am = A - centroid_A[..., None, :]
    Bm = B - centroid_B[..., None, :]
    # H = Amᵀ diag(w) Bm
    H = jnp.einsum("...ni,...n,...nj->...ij", Am, weights, Bm)
    # Normalize scale for numerical stability of the eigen solve.
    scale = jnp.maximum(jnp.max(jnp.abs(H), axis=(-1, -2), keepdims=True), 1e-12)
    N4 = _horn_profile_matrix(H / scale)
    evals, evecs = jacobi_eigh(N4)
    idx = jnp.argmax(evals, axis=-1)
    q = jnp.take_along_axis(evecs, idx[..., None, None].repeat(4, -2), axis=-1)[..., 0]
    R = quat_to_rotmat(q)
    t = centroid_B - jnp.einsum("...ij,...j->...i", R, centroid_A)
    from eyoc_tpu.geometry.se3 import integrate_trans

    return integrate_trans(R, t)
