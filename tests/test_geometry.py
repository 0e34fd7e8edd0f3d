import jax
import jax.numpy as jnp
import numpy as np
import pytest

from eyoc_tpu.geometry import (
    transform_points,
    integrate_trans,
    inverse_trans,
    rotation_from_axis_angle,
    jacobi_eigh,
    kabsch,
    est_quad_linear_robust,
    rte,
    rre_deg,
    registration_success,
    hit_ratio,
    pdist2,
)


def random_rotation(rng, magnitude=np.pi):
    axis = rng.standard_normal(3)
    angle = rng.uniform(-magnitude, magnitude)
    return np.asarray(rotation_from_axis_angle(jnp.asarray(axis, jnp.float32), jnp.float32(angle)))


def random_trans(rng, magnitude=np.pi, tmax=10.0):
    T = np.eye(4, dtype=np.float32)
    T[:3, :3] = random_rotation(rng, magnitude)
    T[:3, 3] = rng.uniform(-tmax, tmax, 3)
    return T


class TestSE3:
    def test_transform_inverse_roundtrip(self):
        rng = np.random.default_rng(0)
        T = jnp.asarray(random_trans(rng))
        pts = jnp.asarray(rng.standard_normal((100, 3)), jnp.float32)
        back = transform_points(transform_points(pts, T), inverse_trans(T))
        np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-4)

    def test_integrate_decompose(self):
        rng = np.random.default_rng(1)
        R = jnp.asarray(random_rotation(rng))
        t = jnp.asarray(rng.standard_normal(3), jnp.float32)
        T = integrate_trans(R, t)
        np.testing.assert_allclose(np.asarray(T[:3, :3]), np.asarray(R))
        np.testing.assert_allclose(np.asarray(T[:3, 3]), np.asarray(t))
        np.testing.assert_allclose(np.asarray(T[3]), [0, 0, 0, 1])

    def test_rotation_orthonormal(self):
        rng = np.random.default_rng(2)
        for _ in range(5):
            R = random_rotation(rng)
            np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-5)
            assert abs(np.linalg.det(R) - 1.0) < 1e-5


class TestJacobiEigh:
    def test_matches_numpy_3x3(self):
        rng = np.random.default_rng(3)
        A = rng.standard_normal((64, 3, 3)).astype(np.float32)
        S = A + np.swapaxes(A, -1, -2)
        evals, evecs = jax.vmap(jacobi_eigh)(jnp.asarray(S))
        evals, evecs = np.asarray(evals), np.asarray(evecs)
        ref = np.linalg.eigvalsh(S)
        np.testing.assert_allclose(np.sort(evals, -1), ref, atol=1e-3)
        # Check A v = lambda v
        Av = np.einsum("bij,bjk->bik", S, evecs)
        lv = evals[:, None, :] * evecs
        np.testing.assert_allclose(Av, lv, atol=2e-3)

    def test_matches_numpy_4x4(self):
        rng = np.random.default_rng(4)
        A = rng.standard_normal((32, 4, 4)).astype(np.float32)
        S = A + np.swapaxes(A, -1, -2)
        evals, _ = jax.vmap(jacobi_eigh)(jnp.asarray(S))
        ref = np.linalg.eigvalsh(S)
        np.testing.assert_allclose(np.sort(np.asarray(evals), -1), ref, atol=1e-3)


class TestKabsch:
    def test_exact_recovery(self):
        rng = np.random.default_rng(5)
        for seed in range(5):
            T = random_trans(rng)
            A = rng.uniform(-50, 50, (200, 3)).astype(np.float32)
            B = A @ T[:3, :3].T + T[:3, 3]
            T_est = np.asarray(kabsch(jnp.asarray(A), jnp.asarray(B)))
            np.testing.assert_allclose(T_est, T, atol=1e-2)

    def test_weighted_ignores_outliers(self):
        rng = np.random.default_rng(6)
        T = random_trans(rng)
        A = rng.uniform(-50, 50, (200, 3)).astype(np.float32)
        B = A @ T[:3, :3].T + T[:3, 3]
        B[150:] += rng.uniform(-30, 30, (50, 3))  # corrupt
        w = np.ones(200, np.float32)
        w[150:] = 0.0
        T_est = np.asarray(kabsch(jnp.asarray(A), jnp.asarray(B), jnp.asarray(w)))
        np.testing.assert_allclose(T_est, T, atol=1e-2)

    def test_batched(self):
        rng = np.random.default_rng(7)
        Ts = np.stack([random_trans(rng) for _ in range(8)])
        A = rng.uniform(-10, 10, (8, 100, 3)).astype(np.float32)
        B = np.einsum("bij,bnj->bni", Ts[:, :3, :3], A) + Ts[:, None, :3, 3]
        T_est = np.asarray(kabsch(jnp.asarray(A), jnp.asarray(B)))
        np.testing.assert_allclose(T_est, Ts, atol=1e-2)

    def test_degenerate_zero_weights_is_finite(self):
        A = jnp.zeros((10, 3))
        B = jnp.zeros((10, 3))
        T = np.asarray(kabsch(A, B, jnp.zeros(10)))
        assert np.all(np.isfinite(T))


class TestIRLS:
    def test_small_pose_recovery(self):
        rng = np.random.default_rng(8)
        T = random_trans(rng, magnitude=0.2, tmax=1.0)
        A = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
        B = A @ T[:3, :3].T + T[:3, 3]
        T_est = np.asarray(est_quad_linear_robust(jnp.asarray(A), jnp.asarray(B)))
        assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.05
        assert float(rre_deg(jnp.asarray(T_est), jnp.asarray(T))) < 1.0

    def test_robust_to_outliers(self):
        rng = np.random.default_rng(9)
        T = random_trans(rng, magnitude=0.2, tmax=1.0)
        A = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
        B = A @ T[:3, :3].T + T[:3, 3]
        B[:100] += rng.uniform(-10, 10, (100, 3))
        T_est = np.asarray(est_quad_linear_robust(jnp.asarray(A), jnp.asarray(B)))
        assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.2

    def test_mask(self):
        rng = np.random.default_rng(10)
        T = random_trans(rng, magnitude=0.2, tmax=1.0)
        A = rng.uniform(-20, 20, (500, 3)).astype(np.float32)
        B = A @ T[:3, :3].T + T[:3, 3]
        # pad rows are pure garbage but masked
        A[400:] = 1e3
        B[400:] = -1e3
        mask = np.arange(500) < 400
        T_est = np.asarray(
            est_quad_linear_robust(jnp.asarray(A), jnp.asarray(B), mask=jnp.asarray(mask))
        )
        assert np.linalg.norm(T_est[:3, 3] - T[:3, 3]) < 0.05


class TestMetrics:
    def test_rre_identity(self):
        T = jnp.eye(4)
        assert float(rre_deg(T, T)) < 1e-3

    def test_rre_known_angle(self):
        R = rotation_from_axis_angle(jnp.asarray([0.0, 0.0, 1.0]), jnp.float32(np.radians(30)))
        T = integrate_trans(R, jnp.zeros(3))
        assert abs(float(rre_deg(T, jnp.eye(4))) - 30.0) < 0.1

    def test_success(self):
        T_gt = jnp.eye(4)
        T_close = jnp.eye(4).at[0, 3].set(1.0)
        T_far = jnp.eye(4).at[0, 3].set(3.0)
        ok, _, _ = registration_success(T_close, T_gt)
        bad, _, _ = registration_success(T_far, T_gt)
        assert bool(ok) and not bool(bad)

    def test_hit_ratio(self):
        rng = np.random.default_rng(11)
        xyz0 = jnp.asarray(rng.uniform(-10, 10, (100, 3)), jnp.float32)
        T = jnp.eye(4)
        hr = float(hit_ratio(xyz0, xyz0, T, thresh=0.1))
        assert hr == 1.0
        hr2 = float(hit_ratio(xyz0, xyz0 + 5.0, T, thresh=0.1))
        assert hr2 == 0.0

    def test_pdist2(self):
        rng = np.random.default_rng(12)
        a = rng.standard_normal((10, 4)).astype(np.float32)
        b = rng.standard_normal((7, 4)).astype(np.float32)
        ref = ((a[:, None] - b[None]) ** 2).sum(-1)
        np.testing.assert_allclose(np.asarray(pdist2(jnp.asarray(a), jnp.asarray(b))), ref, atol=1e-4)


class TestKabschQCP:
    """QCP (characteristic-quartic) Kabsch must agree with the Jacobi path."""

    def _random_problem(self, seed, S=256, N=20, noise=0.0):
        rng = np.random.default_rng(seed)
        A = rng.normal(size=(S, N, 3)).astype(np.float32) * 10
        Bs = np.empty_like(A)
        for s in range(S):
            T = random_trans(rng)
            Bs[s] = A[s] @ T[:3, :3].T + T[:3, 3]
        if noise:
            Bs = Bs + rng.normal(size=Bs.shape).astype(np.float32) * noise
        w = rng.uniform(0.1, 1.0, size=(S, N)).astype(np.float32)
        return jnp.asarray(A), jnp.asarray(Bs), jnp.asarray(w)

    def test_quartic_coeffs_match_numpy_charpoly(self):
        from eyoc_tpu.geometry.svd3 import _horn_profile_matrix, _qcp_quartic_coeffs

        rng = np.random.default_rng(3)
        H = rng.normal(size=(64, 3, 3)).astype(np.float32)
        N4 = np.asarray(_horn_profile_matrix(jnp.asarray(H)), np.float64)
        c2, c1, c0 = (np.asarray(c, np.float64)
                      for c in _qcp_quartic_coeffs(jnp.asarray(H)))
        for i in range(64):
            ev = np.linalg.eigvalsh(N4[i])
            # evaluate x^4 + c2 x^2 + c1 x + c0 at the true eigenvalues
            P = ev**4 + c2[i] * ev**2 + c1[i] * ev + c0[i]
            assert np.abs(P).max() < 1e-2 * max(1.0, np.abs(ev).max() ** 4)

    def test_matches_jacobi_noisy_weighted(self):
        from eyoc_tpu.geometry import kabsch_qcp

        A, B, w = self._random_problem(0, noise=0.5)
        Tj = jax.jit(kabsch)(A, B, w)
        Tq = jax.jit(kabsch_qcp)(A, B, w)
        dR = np.linalg.norm(np.asarray(Tj[:, :3, :3] - Tq[:, :3, :3]), axis=(1, 2))
        dt = np.linalg.norm(np.asarray(Tj[:, :3, 3] - Tq[:, :3, 3]), axis=1)
        assert dR.max() < 1e-3 and dt.max() < 1e-2

    def test_exact_recovery_clean(self):
        from eyoc_tpu.geometry import kabsch_qcp

        A, B, w = self._random_problem(1)
        Tq = np.asarray(jax.jit(kabsch_qcp)(A, B, w))
        err = np.linalg.norm(
            np.einsum("sij,snj->sni", Tq[:, :3, :3], np.asarray(A))
            + Tq[:, None, :3, 3] - np.asarray(B), axis=-1)
        assert err.max() < 1e-3

    def test_near_180_degree_rotations(self):
        from eyoc_tpu.geometry import kabsch_qcp

        rng = np.random.default_rng(2)
        A = rng.normal(size=(32, 30, 3)).astype(np.float32) * 5
        Bs = np.empty_like(A)
        for s in range(32):
            axis = rng.standard_normal(3)
            R = np.asarray(rotation_from_axis_angle(
                jnp.asarray(axis, jnp.float32),
                jnp.float32(np.pi - 1e-3 * rng.uniform())))
            Bs[s] = A[s] @ R.T
        Tq = np.asarray(jax.jit(kabsch_qcp)(jnp.asarray(A), jnp.asarray(Bs)))
        err = np.linalg.norm(
            np.einsum("sij,snj->sni", Tq[:, :3, :3], A) - Bs, axis=-1)
        assert err.max() < 1e-2

    def test_degenerate_zero_weights_is_finite(self):
        from eyoc_tpu.geometry import kabsch_qcp

        A = jnp.zeros((4, 10, 3))
        B = jnp.zeros((4, 10, 3))
        w = jnp.zeros((4, 10))
        T = np.asarray(jax.jit(kabsch_qcp)(A, B, w))
        assert np.isfinite(T).all()
        # degenerate fallback is the identity rotation
        assert np.allclose(T[:, :3, :3], np.eye(3), atol=1e-5)
