"""IMU propagation vs float64 numpy oracle + covariance sanity."""

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

import jax.numpy as jnp

from limovelo_tpu import Config
from limovelo_tpu.filter.process import ImuWindow, predict_window, process_noise_Q
from limovelo_tpu.geometry import state as st


def np_exp(w):
    return Rsc.from_rotvec(w).as_matrix()


def oracle_propagate(R, p, v, bg, ba, g, ts, accs, gyrs, t0):
    """Reference nominal integration (State::propagate_f semantics, f64)."""
    t_prev = t0
    for t, a, w in zip(ts, accs, gyrs):
        dt = t - t_prev
        acc_w = R @ (a - ba) + g
        p = p + v * dt + 0.5 * acc_w * dt * dt
        v = v + acc_w * dt
        R = R @ np_exp((w - bg) * dt)
        t_prev = t
    return R, p, v


def make_window(rng, M, t0=0.0, rate=100.0):
    ts = t0 + (np.arange(M) + 1) / rate
    accs = rng.normal(size=(M, 3)) * 0.5 + np.array([0, 0, 9.807])
    gyrs = rng.normal(size=(M, 3)) * 0.3
    return ts.astype(np.float32), accs.astype(np.float32), gyrs.astype(np.float32)


class TestNominalPropagation:
    def test_matches_oracle(self, rng):
        cfg = Config()
        x = st.make_initial(cfg)
        P = st.initial_covariance()
        Q = process_noise_Q(cfg)
        ts, accs, gyrs = make_window(rng, 50)
        win = ImuWindow(
            t=jnp.asarray(ts), a=jnp.asarray(accs), w=jnp.asarray(gyrs),
            mask=jnp.ones(50, bool),
        )
        x2, P2 = predict_window(x, P, win, 0.0, Q)

        R0 = np.eye(3)
        g = np.array(cfg.gravity_vec, np.float64)
        R_ref, p_ref, v_ref = oracle_propagate(
            R0, np.zeros(3), np.zeros(3), np.zeros(3), np.zeros(3), g,
            ts.astype(np.float64), accs.astype(np.float64), gyrs.astype(np.float64), 0.0,
        )
        np.testing.assert_allclose(np.asarray(x2.R), R_ref, atol=1e-4)
        np.testing.assert_allclose(np.asarray(x2.p), p_ref, atol=1e-3)
        np.testing.assert_allclose(np.asarray(x2.v), v_ref, atol=1e-3)

    def test_padding_ignored(self, rng):
        cfg = Config()
        x = st.make_initial(cfg)
        P = st.initial_covariance()
        Q = process_noise_Q(cfg)
        ts, accs, gyrs = make_window(rng, 20)
        # same window padded to 64 with garbage
        pad = 44
        win_a = ImuWindow(jnp.asarray(ts), jnp.asarray(accs), jnp.asarray(gyrs), jnp.ones(20, bool))
        win_b = ImuWindow(
            jnp.concatenate([jnp.asarray(ts), jnp.full((pad,), 99.0)]),
            jnp.concatenate([jnp.asarray(accs), jnp.full((pad, 3), 123.0)]),
            jnp.concatenate([jnp.asarray(gyrs), jnp.full((pad, 3), -55.0)]),
            jnp.concatenate([jnp.ones(20, bool), jnp.zeros(pad, bool)]),
        )
        xa, Pa = predict_window(x, P, win_a, 0.0, Q)
        xb, Pb = predict_window(x, P, win_b, 0.0, Q)
        np.testing.assert_allclose(np.asarray(xa.p), np.asarray(xb.p), atol=1e-6)
        np.testing.assert_allclose(np.asarray(Pa), np.asarray(Pb), atol=1e-6)

    def test_rest_at_gravity(self):
        """Body at rest with perfect accel reading −g: velocity stays 0."""
        cfg = Config()  # gravity (0,0,-9.807); gravity_vec = (0,0,9.807)... no:
        # initial_gravity=(0,0,-9.807) → g_state=(0,0,+9.807); at rest the
        # accelerometer must read a = −g_state = (0,0,−9.807) for v̇=R a+g=0.
        x = st.make_initial(cfg)
        P = st.initial_covariance()
        Q = process_noise_Q(cfg)
        M = 100
        ts = (np.arange(M) + 1) / 100.0
        a_rest = -np.array(cfg.gravity_vec, np.float32)
        win = ImuWindow(
            jnp.asarray(ts, jnp.float32),
            jnp.tile(jnp.asarray(a_rest), (M, 1)),
            jnp.zeros((M, 3), jnp.float32),
            jnp.ones(M, bool),
        )
        x2, _ = predict_window(x, P, win, 0.0, Q)
        np.testing.assert_allclose(np.asarray(x2.v), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(x2.p), 0.0, atol=1e-5)
        np.testing.assert_allclose(np.asarray(x2.R), np.eye(3), atol=1e-6)


class TestCovariance:
    def test_grows_and_stays_psd(self, rng):
        cfg = Config()
        x = st.make_initial(cfg)
        P = st.initial_covariance()
        Q = process_noise_Q(cfg)
        ts, accs, gyrs = make_window(rng, 100)
        win = ImuWindow(jnp.asarray(ts), jnp.asarray(accs), jnp.asarray(gyrs), jnp.ones(100, bool))
        _, P2 = predict_window(x, P, win, 0.0, Q)
        P2 = np.asarray(P2, np.float64)
        # symmetric PSD (f32 accumulation: tolerate relative asymmetry)
        np.testing.assert_allclose(P2, P2.T, atol=1e-4, rtol=1e-5)
        eig = np.linalg.eigvalsh(0.5 * (P2 + P2.T))
        assert eig.min() > -1e-6
        # pose uncertainty grows under noisy IMU
        P0 = np.asarray(P)
        assert np.trace(P2[:3, :3]) > np.trace(P0[:3, :3]) * 0.999

    def test_jacobian_consistency_fd(self, rng):
        """Fx from error_jacobians ≈ finite-difference of the nominal step
        through boxplus/boxminus."""
        from limovelo_tpu.filter.process import error_jacobians, nominal_step

        cfg = Config()
        x = st.make_initial(cfg)
        # randomize the linearization point
        x = st.boxplus(x, jnp.asarray(rng.normal(size=23) * 0.3, jnp.float32))
        a = jnp.asarray(rng.normal(size=3) + np.array([0, 0, 9.8]), jnp.float32)
        w = jnp.asarray(rng.normal(size=3), jnp.float32)
        dt = 0.01
        Fx, _ = error_jacobians(x, a, w, dt)
        Fx = np.asarray(Fx, np.float64)

        f0 = nominal_step(x, a, w, dt)
        eps = 1e-3
        cols = []
        for k in range(23):
            dxk = np.zeros(23, np.float32)
            dxk[k] = eps
            xk = st.boxplus(x, jnp.asarray(dxk))
            fk = nominal_step(xk, a, w, dt)
            cols.append(np.asarray(st.boxminus(fk, f0), np.float64) / eps)
        Fd = np.stack(cols, axis=1)
        # first-order discretization: tolerate O(dt·‖pert‖) terms
        np.testing.assert_allclose(Fx, Fd, atol=5e-3)
