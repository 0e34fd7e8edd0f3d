"""QCP closed-form leading eigenvector of the Horn 4x4 profile matrix
(Theobald 2005) vs the current 8-sweep Jacobi: numerics + speed at SC2-PCR
shapes ([S=1000] batched seed kabsch; serial post_refine chain).

The Horn profile matrix N4 is traceless symmetric 4x4. Its characteristic
polynomial is a depressed quartic P(x) = x^4 + c2 x^2 + c1 x + c0 with
  c2 = -2 tr(HᵀH), c1 = -8 det(H), c0 = det(N4)
(H = weighted cross-covariance). Newton from x0 = (GA+GB)/2 (an upper bound
on the leading eigenvalue) converges monotonically; the eigenvector is any
nonzero column of adj(N4 - λI), polished by two shifted power iterations.
All steps are branchless elementwise ops — no serial Givens chain.
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from eyoc_tpu.geometry.svd3 import _horn_profile_matrix, jacobi_eigh, kabsch, quat_to_rotmat
from eyoc_tpu.geometry.se3 import integrate_trans


def _det3(a, b, c, d, e, f, g, h, i):
    return a * (e * i - f * h) - b * (d * i - f * g) + c * (d * h - e * g)


def _adj4_sym(A):
    """Adjugate of a symmetric [..., 4, 4] matrix (symmetric result)."""
    a = [[A[..., r, c] for c in range(4)] for r in range(4)]

    def minor(r, c):
        rows = [x for x in range(4) if x != r]
        cols = [x for x in range(4) if x != c]
        m = [a[rr][cc] for rr in rows for cc in cols]
        return _det3(*m)

    cof = [[((-1.0) ** (r + c)) * minor(r, c) for c in range(4)] for r in range(4)]
    # adj = cofᵀ; symmetric A -> symmetric adj
    return jnp.stack([jnp.stack([cof[c][r] for c in range(4)], -1)
                      for r in range(4)], -2)


def qcp_leading_eigvec(N4, GA_plus_GB):
    """Leading eigenvector of the (traceless symmetric) Horn matrix [...,4,4].

    GA_plus_GB: elementwise upper bound for the leading eigenvalue
    (sum of weighted squared norms of both centered point sets).
    """
    f32 = jnp.float32
    N4 = N4.astype(f32)
    # characteristic quartic coefficients (traceless => no cubic term)
    sq = jnp.sum(N4 * N4, axis=(-1, -2))
    c2 = -0.5 * sq
    # c1 = -8 det(H); recover from N4? cheaper: compute from N4 via trace(N4^3)/? —
    # for traceless symmetric: sum λ^3 = 3 * (-c1) => c1 = -tr(N4^3)/3
    N4sq = N4 @ N4
    c1 = -jnp.trace(N4sq @ N4, axis1=-2, axis2=-1) / 3.0
    # c0 = det(N4) via adjugate-free: det = (tr(M2)^2 - tr(M2 @ M2)) / 8 ... use
    # Newton-Girard for traceless: e4 = det = (p2^2/8 - p4/4) with pk = tr(N4^k)
    p2 = jnp.trace(N4sq, axis1=-2, axis2=-1)
    p4 = jnp.sum(N4sq * jnp.swapaxes(N4sq, -1, -2), axis=(-1, -2))
    c0 = (p2 * p2 - 2.0 * p4) / 8.0

    x = GA_plus_GB.astype(f32)

    def newton(_, x):
        x2 = x * x
        P = x2 * x2 + c2 * x2 + c1 * x + c0
        dP = 4.0 * x2 * x + 2.0 * c2 * x + c1
        return x - P / jnp.where(jnp.abs(dP) < 1e-12, 1e-12, dP)

    lam = jax.lax.fori_loop(0, 12, newton, x)

    eye = jnp.eye(4, dtype=f32)
    Ash = N4 - lam[..., None, None] * eye
    adj = _adj4_sym(Ash)
    # pick the column with the largest norm (branchless)
    nrm = jnp.sum(adj * adj, axis=-2)
    col = jnp.argmax(nrm, axis=-1)
    q = jnp.take_along_axis(adj, col[..., None, None].repeat(4, -2), -1)[..., 0]
    # degenerate fallback: identity quaternion
    qn = jnp.sqrt(jnp.sum(q * q, -1, keepdims=True))
    q = jnp.where(qn > 1e-12, q / (qn + 1e-30),
                  jnp.array([1.0, 0, 0, 0], f32))
    # polish: two shifted power iterations (N4 + bound*I is PSD-dominant)
    shift = GA_plus_GB[..., None, None]
    for _ in range(2):
        q = ((N4 + shift * eye) @ q[..., None])[..., 0]
        q = q / (jnp.linalg.norm(q, axis=-1, keepdims=True) + 1e-30)
    return q


def kabsch_qcp(A, B, weights=None):
    A = A.astype(jnp.float32)
    B = B.astype(jnp.float32)
    if weights is None:
        weights = jnp.ones(A.shape[:-1], jnp.float32)
    wsum = jnp.sum(weights, axis=-1, keepdims=True) + 1e-6
    cA = jnp.sum(A * weights[..., None], axis=-2) / wsum
    cB = jnp.sum(B * weights[..., None], axis=-2) / wsum
    Am = A - cA[..., None, :]
    Bm = B - cB[..., None, :]
    H = jnp.einsum("...ni,...n,...nj->...ij", Am, weights, Bm)
    scale = jnp.maximum(jnp.max(jnp.abs(H), axis=(-1, -2), keepdims=True), 1e-12)
    Hn = H / scale
    GA = jnp.sum(weights * jnp.sum(Am * Am, -1), -1)
    GB = jnp.sum(weights * jnp.sum(Bm * Bm, -1), -1)
    bound = (GA + GB) / (2.0 * scale[..., 0, 0])
    N4 = _horn_profile_matrix(Hn)
    q = qcp_leading_eigvec(N4, bound)
    R = quat_to_rotmat(q)
    t = cB - jnp.einsum("...ij,...j->...i", R, cA)
    return integrate_trans(R, t)


def _force(x):
    return float(jnp.sum(jnp.ravel(x)[:1].astype(jnp.float32)))


def bench(name, fn, *args, K=16, n=3):
    run = jax.jit(lambda *a: jax.lax.fori_loop(
        0, K, lambda i, c: c + fn(a[0] + c * 0, *a[1:])[..., 0, 0].sum(), 0.0))
    _force(run(*args))
    best = float("inf")
    for _ in range(n):
        t0 = time.perf_counter()
        _force(run(*args))
        best = min(best, (time.perf_counter() - t0) / K)
    print(f"{name:40s} {best*1e6:9.1f} us", flush=True)


def main():
    rng = np.random.default_rng(0)
    # batched: [1000, 20, 3] weighted (the seed-kabsch shape)
    A = rng.normal(size=(1000, 20, 3)).astype(np.float32) * 10
    th = rng.uniform(-np.pi, np.pi, size=1000)
    errs_r, errs_t = [], []
    Bs = np.empty_like(A)
    for s in range(1000):
        c, s_ = np.cos(th[s]), np.sin(th[s])
        R = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1]], np.float32)
        Bs[s] = A[s] @ R.T + rng.normal(size=3).astype(np.float32) * 5
    w = rng.uniform(0.1, 1.0, size=(1000, 20)).astype(np.float32)
    # some degenerate rows: all weights ~ 0
    w[:5] = 1e-9

    Aj, Bj, wj = jnp.asarray(A), jnp.asarray(Bs), jnp.asarray(w)
    T_j = jax.jit(kabsch)(Aj, Bj, wj)
    T_q = jax.jit(kabsch_qcp)(Aj, Bj, wj)
    dR = np.asarray(jnp.linalg.norm(T_j[:, :3, :3] - T_q[:, :3, :3], axis=(1, 2)))
    dt = np.asarray(jnp.linalg.norm(T_j[:, :3, 3] - T_q[:, :3, 3], axis=1))
    print(f"batched [1000,20]: max |dR|={dR[5:].max():.2e} max |dt|={dt[5:].max():.2e}"
          f"  (degenerate rows dR={dR[:5].max():.2e})")

    # exact-recovery check vs ground truth on clean data
    err = 0.0
    for s in range(0, 1000, 97):
        c, s_ = np.cos(th[s]), np.sin(th[s])
        Rt = np.array([[c, -s_, 0], [s_, c, 0], [0, 0, 1]], np.float32)
        err = max(err, np.abs(np.asarray(T_q[s, :3, :3]) - Rt).max())
    print(f"GT rotation recovery max err (QCP): {err:.2e}")

    bench("kabsch jacobi [1000,20,3]", kabsch, Aj, Bj, wj)
    bench("kabsch qcp    [1000,20,3]", kabsch_qcp, Aj, Bj, wj)

    # serial chain: 20 dependent solves at [1, N=5000] (post_refine shape)
    A2 = jnp.asarray(rng.normal(size=(1, 5000, 3)).astype(np.float32) * 10)
    B2 = jnp.asarray(np.asarray(A2) @ np.array(
        [[0, -1, 0], [1, 0, 0], [0, 0, 1]], np.float32).T + 1.0)
    w2 = jnp.ones((1, 5000), jnp.float32)

    def chain(fn):
        def run(A, B, w):
            def body(_, T):
                T2 = fn(A, B, w * (1 + 0 * T[0, 0, 0]))[0]
                return T2[None]
            return jax.lax.fori_loop(0, 20, body, jnp.eye(4)[None])
        return run
    bench("20-chain jacobi [1,5000]", chain(kabsch), A2, B2, w2, K=4)
    bench("20-chain qcp    [1,5000]", chain(kabsch_qcp), A2, B2, w2, K=4)


if __name__ == "__main__":
    main()
