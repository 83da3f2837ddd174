"""Geometry oracles: SO(3)/S²/SE(3)/state chart vs scipy + finite differences."""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

import jax
import jax.numpy as jnp

from limovelo_tpu import Config
from limovelo_tpu.geometry import s2, se3, so3, state


def random_rotvecs(rng, n, scale=2.0):
    v = rng.normal(size=(n, 3)) * scale
    return v.astype(np.float32)


class TestSO3:
    def test_exp_matches_scipy(self, rng):
        w = random_rotvecs(rng, 64)
        R = np.asarray(so3.exp(jnp.asarray(w)))
        R_ref = Rsc.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-5)

    def test_exp_small_angles(self, rng):
        w = random_rotvecs(rng, 16, scale=1e-7)
        R = np.asarray(so3.exp(jnp.asarray(w)))
        R_ref = Rsc.from_rotvec(w.astype(np.float64)).as_matrix()
        np.testing.assert_allclose(R, R_ref, atol=1e-6)

    def test_log_roundtrip(self, rng):
        w = random_rotvecs(rng, 64, scale=0.8)
        # log returns the principal value — keep inputs strictly inside |w|<pi
        norms = np.linalg.norm(w, axis=-1, keepdims=True)
        w = np.where(norms > 3.0, w * (3.0 / norms), w).astype(np.float32)
        w2 = np.asarray(so3.log(so3.exp(jnp.asarray(w))))
        np.testing.assert_allclose(w2, w, atol=1e-4)

    def test_log_near_pi(self, rng):
        axes = rng.normal(size=(32, 3))
        axes /= np.linalg.norm(axes, axis=-1, keepdims=True)
        for ang in [3.05, 3.12, np.pi - 1e-4]:
            w = (axes * ang).astype(np.float32)
            R = Rsc.from_rotvec(w).as_matrix().astype(np.float32)
            w2 = np.asarray(so3.log(jnp.asarray(R)))
            R2 = Rsc.from_rotvec(w2).as_matrix()
            # axis sign may flip at exactly pi; compare rotations not vectors
            np.testing.assert_allclose(R2, R, atol=2e-3)

    def test_boxplus_boxminus_inverse(self, rng):
        R = jnp.asarray(Rsc.random(32, rng=np.random.default_rng(1)).as_matrix(), jnp.float32)
        d = jnp.asarray(rng.normal(size=(32, 3)) * 0.5, jnp.float32)
        d2 = so3.boxminus(so3.boxplus(R, d), R)
        np.testing.assert_allclose(np.asarray(d2), np.asarray(d), atol=1e-4)

    def test_left_jacobian_fd(self, rng):
        """Exp(w + J_l^{-1}... ) check: Exp(w+e) ≈ Exp(J_l(w) e) Exp(w)."""
        w = rng.normal(size=3).astype(np.float64) * 1.2
        e = rng.normal(size=3) * 1e-5
        lhs = Rsc.from_rotvec(w + e).as_matrix()
        Jl = np.asarray(so3.left_jacobian(jnp.asarray(w, jnp.float64))) if jax.config.jax_enable_x64 else np.asarray(so3.left_jacobian(jnp.asarray(w, jnp.float32)), np.float64)
        rhs = Rsc.from_rotvec(Jl @ e).as_matrix() @ Rsc.from_rotvec(w).as_matrix()
        np.testing.assert_allclose(lhs, rhs, atol=1e-8)

    def test_jacobian_inverse_consistent(self, rng):
        w = jnp.asarray(rng.normal(size=(8, 3)) * 1.5, jnp.float32)
        J = so3.left_jacobian(w)
        Jinv = so3.left_jacobian_inv(w)
        eye = np.broadcast_to(np.eye(3), (8, 3, 3))
        np.testing.assert_allclose(np.asarray(J @ Jinv), eye, atol=1e-5)

    def test_normalize(self, rng):
        R = Rsc.random(8, rng=np.random.default_rng(2)).as_matrix().astype(np.float32)
        R_noisy = R + rng.normal(size=R.shape).astype(np.float32) * 1e-3
        Rn = np.asarray(so3.normalize(jnp.asarray(R_noisy)))
        err = Rn @ np.swapaxes(Rn, -1, -2) - np.eye(3)
        assert np.abs(err).max() < 1e-5


class TestS2:
    def test_basis_orthonormal_tangent(self, rng):
        g = jnp.asarray(rng.normal(size=(32, 3)) * 9.8, jnp.float32)
        B = np.asarray(s2.basis(g))
        BtB = np.swapaxes(B, -1, -2) @ B
        np.testing.assert_allclose(BtB, np.broadcast_to(np.eye(2), BtB.shape), atol=1e-5)
        gn = np.asarray(g)
        proj = np.einsum("ni,nij->nj", gn, B)
        np.testing.assert_allclose(proj, 0.0, atol=1e-3)

    def test_boxplus_preserves_norm(self, rng):
        g = jnp.asarray(rng.normal(size=(16, 3)) * 9.8, jnp.float32)
        d = jnp.asarray(rng.normal(size=(16, 2)) * 0.3, jnp.float32)
        g2 = s2.boxplus(g, d)
        np.testing.assert_allclose(
            np.linalg.norm(np.asarray(g2), axis=-1),
            np.linalg.norm(np.asarray(g), axis=-1),
            rtol=1e-5,
        )

    def test_boxminus_roundtrip(self, rng):
        g = jnp.asarray(rng.normal(size=(16, 3)), jnp.float32)
        g = g / jnp.linalg.norm(g, axis=-1, keepdims=True) * 9.807
        d = jnp.asarray(rng.normal(size=(16, 2)) * 0.2, jnp.float32)
        d2 = s2.boxminus(s2.boxplus(g, d), g)
        # boxminus returns the geodesic tangent — equal to d up to basis rotation;
        # check via boxplus equivalence instead of raw components
        g2 = s2.boxplus(g, d2)
        np.testing.assert_allclose(np.asarray(g2), np.asarray(s2.boxplus(g, d)), atol=1e-4)

    def test_dexp_fd(self, rng):
        g = jnp.asarray([0.1, -0.3, -9.8], jnp.float32)
        J = np.asarray(s2.dexp_dg(g))
        for k in range(2):
            e = np.zeros(2, np.float32)
            e[k] = 1e-4
            gp = np.asarray(s2.boxplus(g, jnp.asarray(e)))
            gm = np.asarray(s2.boxplus(g, jnp.asarray(-e)))
            fd = (gp - gm) / 2e-4
            np.testing.assert_allclose(J[:, k], fd, atol=1e-2)


class TestSE3:
    def test_compose_inverse_apply(self, rng):
        Ra = Rsc.random(4, rng=np.random.default_rng(3)).as_matrix().astype(np.float32)
        ta = rng.normal(size=(4, 3)).astype(np.float32)
        a = se3.RigidTransform(jnp.asarray(Ra), jnp.asarray(ta))
        inv = se3.inverse(a)
        ident = se3.compose(a, inv)
        np.testing.assert_allclose(np.asarray(ident.R), np.broadcast_to(np.eye(3), (4, 3, 3)), atol=1e-5)
        np.testing.assert_allclose(np.asarray(ident.t), 0.0, atol=1e-5)

    def test_apply_batch(self, rng):
        R = Rsc.random(1, rng=np.random.default_rng(4)).as_matrix()[0].astype(np.float32)
        t = rng.normal(size=3).astype(np.float32)
        pts = rng.normal(size=(100, 3)).astype(np.float32)
        out = np.asarray(se3.apply(se3.RigidTransform(jnp.asarray(R), jnp.asarray(t)), jnp.asarray(pts)))
        np.testing.assert_allclose(out, pts @ R.T + t, atol=1e-5)


class TestStateChart:
    def test_boxplus_boxminus_roundtrip(self, rng):
        cfg = Config()
        x = state.make_initial(cfg)
        dx = jnp.asarray(rng.normal(size=state.ERROR_DIM) * 0.1, jnp.float32)
        x2 = state.boxplus(x, dx)
        dx2 = state.boxminus(x2, x)
        np.testing.assert_allclose(np.asarray(dx2), np.asarray(dx), atol=1e-4)

    def test_zero_error(self):
        x = state.make_initial(Config())
        dx = state.boxminus(x, x)
        np.testing.assert_allclose(np.asarray(dx), 0.0, atol=1e-6)

    def test_initial_covariance_indices(self):
        P = np.asarray(state.initial_covariance())
        assert P.shape == (23, 23)
        # Localizator.cpp:148-156
        d = np.diag(P)
        np.testing.assert_allclose(d[6:12], 1e-5, rtol=1e-6)
        np.testing.assert_allclose(d[15:18], 1e-4, rtol=1e-6)
        np.testing.assert_allclose(d[18:21], 1e-3, rtol=1e-5)
        np.testing.assert_allclose(d[21:23], 1e-5, rtol=1e-6)
        np.testing.assert_allclose(d[0:6], 1.0)
        np.testing.assert_allclose(d[12:15], 1.0)

    def test_lidar_to_world_composition(self, rng):
        cfg = Config(
            I_Rotation_L=tuple(Rsc.random(rng=np.random.default_rng(5)).as_matrix().ravel().tolist()),
            I_Translation_L=(0.1, -0.2, 0.3),
        )
        x = state.make_initial(cfg)
        x = state.boxplus(x, jnp.asarray(rng.normal(size=23) * 0.2, jnp.float32))
        p = jnp.asarray(rng.normal(size=3), jnp.float32)
        direct = se3.apply(state.lidar_to_world(x), p)
        manual = se3.apply(state.body_to_world(x), se3.apply(state.lidar_to_imu(x), p))
        np.testing.assert_allclose(np.asarray(direct), np.asarray(manual), atol=1e-5)
