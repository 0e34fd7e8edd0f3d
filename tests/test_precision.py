"""Pin HIGHEST matmul precision in the coordinate-scale geometry kernels.

Round-4 regression guard: on TPU the default f32 matmul runs bf16
operands, which at LiDAR coordinate scale corrupted every radius check in
the system (51% wrong GT positives — PERF_NOTES round-4 session B). The
CPU suite cannot observe the numeric failure (XLA:CPU is f32), so this
test pins the STRUCTURAL property instead: the lowered HLO of each
critical kernel must carry the highest-precision dot attribute, under a
deliberately-degraded default precision (catching any future removal of
the inline Precision.HIGHEST pins).
"""

import jax
import jax.numpy as jnp
import pytest


def _unpinned_dots(txt):
    """Lines of lowered StableHLO whose dot_general carries DEFAULT
    operand precision (spelled `precision = [DEFAULT, DEFAULT]` on this
    jax version). One surviving HIGHEST pin must not mask removal of the
    others, so the check is per-dot, not a global substring. Dots with
    bf16 operands are exempt: those are deliberate reduced-precision
    compute (binary compatibility-matrix products whose values are
    bf16-exact, e.g. sc2pcr.py SC2 measure) where DEFAULT is the intended
    native MXU mode — the invariant guards COORDINATE-SCALE f32 dots."""
    return [ln.strip()[:160] for ln in txt.splitlines()
            if "dot_general" in ln and "DEFAULT" in ln
            and "xbf16>" not in ln.split("->")[0]]


def _hlo_has_highest_dot(fn, *args):
    """All dots pinned HIGHEST, and at least one dot present."""
    txt = jax.jit(fn).lower(*args).as_text()
    bad = _unpinned_dots(txt)
    assert not bad, "unpinned dot_general under degraded default:\n" + \
        "\n".join(bad)
    return ("HIGHEST" in txt) and ("dot" in txt)


@pytest.fixture()
def degraded_default():
    with jax.default_matmul_precision("bfloat16"):
        yield


class TestPrecisionPins:
    def test_pdist2_pins_highest(self, degraded_default):
        from eyoc_tpu.geometry.metrics import pdist2

        a = jnp.zeros((8, 3))
        b = jnp.zeros((16, 3))
        assert _hlo_has_highest_dot(pdist2, a, b)

    def test_transform_points_pins_highest(self, degraded_default):
        from eyoc_tpu.geometry.se3 import transform_points

        pts = jnp.zeros((8, 3))
        T = jnp.eye(4)
        assert _hlo_has_highest_dot(transform_points, pts, T)

    def test_ransac_counting_pins_highest(self, degraded_default):
        from eyoc_tpu.registration.ransac import _count_inliers

        tr = jnp.tile(jnp.eye(4), (4, 1, 1))
        src = jnp.zeros((32, 3))
        tgt = jnp.zeros((32, 3))
        valid = jnp.ones((32,), bool)
        assert _hlo_has_highest_dot(
            lambda t, s, g, v: _count_inliers(t, s, g, v, 0.3, 4),
            tr, src, tgt, valid)

    def test_irls_solver_pins_highest(self, degraded_default):
        from eyoc_tpu.geometry.robust import est_quad_linear_robust

        p0 = jnp.zeros((64, 3))
        p1 = jnp.zeros((64, 3))
        assert _hlo_has_highest_dot(est_quad_linear_robust, p0, p1)

    def test_sc2pcr_pins_highest(self, degraded_default):
        from eyoc_tpu.registration.sc2pcr import SC2PCRConfig, sc2_pcr

        src = jnp.zeros((64, 3))
        tgt = jnp.zeros((64, 3))
        valid = jnp.ones((64,), bool)
        cfg = SC2PCRConfig(max_points=64, seed_cap=8)
        txt = jax.jit(
            lambda s, t, v: sc2_pcr(s, t, v, cfg)).lower(
                src, tgt, valid).as_text()
        assert "HIGHEST" in txt
        bad = _unpinned_dots(txt)
        assert not bad, "unpinned dot_general in sc2_pcr:\n" + "\n".join(bad)

    def test_kabsch_pins_highest(self, degraded_default):
        """Plain (Jacobi) kabsch is the solver RANSAC uses for every
        hypothesis solve and polish — it must pin exactly like kabsch_qcp
        (round-5 ADVICE item: it previously left the cross-covariance
        einsum and translation matvec at default precision)."""
        from eyoc_tpu.geometry.svd3 import kabsch, kabsch_qcp

        a = jnp.zeros((32, 3))
        b = jnp.zeros((32, 3))
        w = jnp.ones((32,))
        assert _hlo_has_highest_dot(kabsch, a, b, w)
        assert _hlo_has_highest_dot(kabsch_qcp, a, b, w)

    def test_ransac_full_pins_highest(self, degraded_default):
        """The whole ransac_registration lowering (hypothesis solves via
        plain kabsch + counting + polish) must carry no DEFAULT dot."""
        from eyoc_tpu.registration.ransac import (RansacConfig,
                                                  ransac_registration)

        src = jnp.zeros((64, 3))
        tgt = jnp.zeros((64, 3))
        valid = jnp.ones((64,), bool)
        cfg = RansacConfig(num_hypotheses=64, full_verify_top=16,
                           hyp_chunk=32)
        txt = jax.jit(
            lambda s, t, v: ransac_registration(
                s, t, v, jax.random.PRNGKey(0), cfg)).lower(
                    src, tgt, valid).as_text()
        bad = _unpinned_dots(txt)
        assert not bad, "unpinned dot_general in ransac:\n" + "\n".join(bad)

    def test_exactness_at_coordinate_scale(self):
        """End-to-end numeric check (runs f32-exact on any backend): the
        pdist2 of far-apart large-magnitude points must resolve a 0.3 m
        offset — the check bf16 operands fail by ~meters."""
        import numpy as np

        from eyoc_tpu.geometry.metrics import pdist2

        a = jnp.asarray([[80.0, -60.0, 2.0]])
        b = a + jnp.asarray([[0.3, 0.0, 0.0]])
        d2 = float(pdist2(a, b)[0, 0])
        # f32 cancellation on ~1e4-magnitude terms leaves ~4e-3 absolute
        # noise — fine; the bf16 failure mode is +-25 absolute
        np.testing.assert_allclose(d2, 0.09, atol=0.02)
