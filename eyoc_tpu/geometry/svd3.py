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
        # HIGHEST: the Givens chains run 40+ dependent tiny products;
        # bf16 operand rounding compounds to ~0.2-0.4 deg of rotation
        # error in the leading eigenvector under the TPU default
        hi = jax.lax.Precision.HIGHEST
        A = jnp.matmul(jnp.matmul(jnp.swapaxes(G, -1, -2), A,
                                  precision=hi), G, precision=hi)
        V = jnp.matmul(V, G, precision=hi)
        return (A, V), None

    pairs = _cyclic_pairs(n) * sweeps
    for pq in pairs:
        (A, V), _ = rotate((A, V), pq)
    return jnp.diagonal(A, axis1=-2, axis2=-1), V


def quat_to_rotmat(q: jnp.ndarray) -> jnp.ndarray:
    """Unit quaternion [..., 4] (w, x, y, z) -> rotation matrix [..., 3, 3].

    A zero quaternion maps to the identity (degenerate-input fallback); the
    normalization is guarded on the squared norm because XLA rewrites
    x/(sqrt(s)+eps) through rsqrt, which turns s=0 into inf*0 = NaN under jit.
    """
    n2 = jnp.sum(q * q, axis=-1, keepdims=True)
    unit = jnp.zeros_like(q).at[..., 0].set(1.0)
    q = jnp.where(n2 > 1e-24, q * jax.lax.rsqrt(jnp.maximum(n2, 1e-24)), unit)
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


def _qcp_quartic_coeffs(H: jnp.ndarray):
    """Characteristic-polynomial coefficients of the Horn profile matrix.

    For the traceless symmetric 4x4 profile matrix N4 of a 3x3
    cross-covariance H, the characteristic polynomial is the depressed
    quartic P(x) = x^4 + c2 x^2 + c1 x + c0 with closed forms in the
    entries of H (Theobald 2005, "Rapid calculation of RMSDs using a
    quaternion-based characteristic polynomial"):

      c2 = -2 tr(HᵀH),  c1 = -8 det(H),  c0 = det(N4) (expanded below).

    Everything is elementwise — deliberately matmul-free so TPU default
    matmul precision (bf16 operands) can never corrupt the coefficients.
    Returns (c2, c1, c0), each [...].
    """
    Sxx, Sxy, Sxz = H[..., 0, 0], H[..., 0, 1], H[..., 0, 2]
    Syx, Syy, Syz = H[..., 1, 0], H[..., 1, 1], H[..., 1, 2]
    Szx, Szy, Szz = H[..., 2, 0], H[..., 2, 1], H[..., 2, 2]

    Sxx2, Syy2, Szz2 = Sxx * Sxx, Syy * Syy, Szz * Szz
    Sxy2, Syz2, Sxz2 = Sxy * Sxy, Syz * Syz, Sxz * Sxz
    Syx2, Szy2, Szx2 = Syx * Syx, Szy * Szy, Szx * Szx

    c2 = -2.0 * (Sxx2 + Syy2 + Szz2 + Sxy2 + Syx2 + Sxz2 + Szx2 + Syz2 + Szy2)
    c1 = 8.0 * (
        Sxx * Syz * Szy + Syy * Szx * Sxz + Szz * Sxy * Syx
        - Sxx * Syy * Szz - Syz * Szx * Sxy - Szy * Syx * Sxz
    )

    SxzpSzx, SyzpSzy, SxypSyx = Sxz + Szx, Syz + Szy, Sxy + Syx
    SyzmSzy, SxzmSzx, SxymSyx = Syz - Szy, Sxz - Szx, Sxy - Syx
    SxxpSyy, SxxmSyy = Sxx + Syy, Sxx - Syy
    t0 = Sxy2 + Sxz2 - Syx2 - Szx2
    t1 = Syy2 + Szz2 - Sxx2 + Syz2 + Szy2
    t2 = 2.0 * (Syz * Szy - Syy * Szz)
    c0 = (
        t0 * t0
        + (t1 + t2) * (t1 - t2)
        + (-SxzpSzx * SyzmSzy + SxymSyx * (SxxmSyy - Szz))
        * (-SxzmSzx * SyzpSzy + SxymSyx * (SxxmSyy + Szz))
        + (-SxzpSzx * SyzpSzy - SxypSyx * (SxxpSyy - Szz))
        * (-SxzmSzx * SyzmSzy - SxypSyx * (SxxpSyy + Szz))
        + (SxypSyx * SyzpSzy + SxzpSzx * (SxxmSyy + Szz))
        * (-SxymSyx * SyzmSzy + SxzpSzx * (SxxpSyy + Szz))
        + (SxypSyx * SyzmSzy + SxzmSzx * (SxxmSyy - Szz))
        * (-SxymSyx * SyzpSzy + SxzmSzx * (SxxpSyy - Szz))
    )
    return c2, c1, c0


def _det3(a, b, c, d, e, f, g, h, i):
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _adjugate4_sym(A: jnp.ndarray) -> jnp.ndarray:
    """Adjugate of a symmetric [..., 4, 4] matrix (elementwise cofactors)."""
    a = [[A[..., r, c] for c in range(4)] for r in range(4)]

    def minor(r, c):
        rows = [x for x in range(4) if x != r]
        cols = [x for x in range(4) if x != c]
        m = [a[rr][cc] for rr in rows for cc in cols]
        return _det3(*m)

    cof = [[((-1.0) ** (r + c)) * minor(r, c) for c in range(4)] for r in range(4)]
    # adj = cofᵀ; symmetric input -> symmetric adjugate
    return jnp.stack(
        [jnp.stack([cof[c][r] for c in range(4)], -1) for r in range(4)], -2
    )


def qcp_leading_quaternion(
    N4: jnp.ndarray,
    c2: jnp.ndarray,
    c1: jnp.ndarray,
    c0: jnp.ndarray,
    lam_upper: jnp.ndarray,
    newton_iters: int = 12,
    polish_iters: int = 2,
) -> jnp.ndarray:
    """Leading eigenvector of the Horn matrix via its characteristic quartic.

    Newton from ``lam_upper`` (any upper bound on the leading eigenvalue —
    (GA+GB)/2 from the Kabsch geometry works) converges monotonically to
    the largest real root; the eigenvector is the largest-norm column of
    adj(N4 - λI), polished by ``polish_iters`` shifted power iterations.
    All branchless elementwise ops — the serial chain is ~``newton_iters``
    scalar steps instead of Jacobi's 48 dependent Givens rotations.
    """
    f32 = jnp.float32
    N4 = N4.astype(f32)
    x = lam_upper.astype(f32)

    def newton(_, x):
        x2 = x * x
        P = x2 * x2 + c2 * x2 + c1 * x + c0
        dP = 4.0 * x2 * x + 2.0 * c2 * x + c1
        return x - P / jnp.where(jnp.abs(dP) < 1e-12, 1e-12, dP)

    lam = jax.lax.fori_loop(0, newton_iters, newton, x)

    eye = jnp.eye(4, dtype=f32)
    adj = _adjugate4_sym(N4 - lam[..., None, None] * eye)
    nrm = jnp.sum(adj * adj, axis=-2)
    col = jnp.argmax(nrm, axis=-1)
    q = jnp.take_along_axis(adj, col[..., None, None].repeat(4, -2), -1)[..., 0]
    # degenerate input (H ~ 0, or repeated leading eigenvalue): identity quat
    qn = jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
    q = jnp.where(qn > 1e-12, q / (qn + 1e-30), jnp.array([1.0, 0, 0, 0], f32))
    # polish: shifted power iterations on the PSD-shifted matrix; the 4x4
    # matvec is pinned to HIGHEST so TPU bf16 matmul defaults can't degrade it
    shift = lam_upper.astype(f32)[..., None, None]
    M = N4 + shift * eye
    for _ in range(polish_iters):
        nq = jnp.einsum("...ij,...j->...i", M, q,
                        precision=jax.lax.Precision.HIGHEST)
        n2 = jnp.sum(nq * nq, -1, keepdims=True)
        # keep the previous (unit) q when M annihilates it (degenerate input);
        # guard on the squared norm so XLA's rsqrt rewrite can't produce inf*0
        q = jnp.where(n2 > 1e-24, nq * jax.lax.rsqrt(jnp.maximum(n2, 1e-24)), q)
    return q


def kabsch_qcp(
    A: jnp.ndarray,
    B: jnp.ndarray,
    weights: jnp.ndarray | None = None,
    weight_threshold: float = 0.0,
) -> jnp.ndarray:
    """Weighted rigid alignment via the QCP characteristic polynomial.

    Same contract and optimum as `kabsch` (reference semantics
    scripts/SC2_PCR/common.py:7-45) but the 4x4 eigenproblem is solved by
    Newton on the closed-form quartic instead of cyclic Jacobi: ~4x less
    serial depth, which matters in SC2-PCR's dependent IRLS chains
    (`registration/sc2pcr.py:_post_refine`) where each solve sits on the
    critical path.
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
    H = jnp.einsum("...ni,...n,...nj->...ij", Am, weights, Bm,
                   precision=jax.lax.Precision.HIGHEST)
    scale = jnp.maximum(jnp.max(jnp.abs(H), axis=(-1, -2), keepdims=True), 1e-12)
    Hn = H / scale
    GA = jnp.sum(weights * jnp.sum(Am * Am, -1), -1)
    GB = jnp.sum(weights * jnp.sum(Bm * Bm, -1), -1)
    lam_upper = (GA + GB) / (2.0 * scale[..., 0, 0])
    N4 = _horn_profile_matrix(Hn)
    c2, c1, c0 = _qcp_quartic_coeffs(Hn)
    q = qcp_leading_quaternion(N4, c2, c1, c0, lam_upper)
    R = quat_to_rotmat(q)
    t = centroid_B - jnp.einsum("...ij,...j->...i", R, centroid_A,
                                precision=jax.lax.Precision.HIGHEST)
    from eyoc_tpu.geometry.se3 import integrate_trans

    return integrate_trans(R, t)


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
    # H = Amᵀ diag(w) Bm — pinned HIGHEST: at LiDAR coordinate scale the
    # TPU bf16 matmul default puts meter-class noise on the cross
    # covariance and the translation (the round-4 failure class;
    # PERF_NOTES "Round 4 session B")
    H = jnp.einsum("...ni,...n,...nj->...ij", Am, weights, Bm,
                   precision=jax.lax.Precision.HIGHEST)
    # Normalize scale for numerical stability of the eigen solve.
    scale = jnp.maximum(jnp.max(jnp.abs(H), axis=(-1, -2), keepdims=True), 1e-12)
    N4 = _horn_profile_matrix(H / scale)
    evals, evecs = jacobi_eigh(N4)
    idx = jnp.argmax(evals, axis=-1)
    q = jnp.take_along_axis(evecs, idx[..., None, None].repeat(4, -2), axis=-1)[..., 0]
    R = quat_to_rotmat(q)
    t = centroid_B - jnp.einsum("...ij,...j->...i", R, centroid_A,
                                precision=jax.lax.Precision.HIGHEST)
    from eyoc_tpu.geometry.se3 import integrate_trans

    return integrate_trans(R, t)
