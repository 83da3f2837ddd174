"""Deskew: path integration + per-point compensation vs float64 oracle."""

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

import jax.numpy as jnp

from limovelo_tpu import Config
from limovelo_tpu.deskew.compensate import build_path, compensate, state_at
from limovelo_tpu.filter.process import ImuWindow
from limovelo_tpu.geometry import state as st


def np_exp(w):
    return Rsc.from_rotvec(w).as_matrix()


def make_imus(rng, M, t0, rate=100.0):
    ts = t0 + (np.arange(M) + 1) / rate
    accs = (rng.normal(size=(M, 3)) * 0.3 + [0, 0, 9.807]).astype(np.float32)
    gyrs = (rng.normal(size=(M, 3)) * 0.5).astype(np.float32)
    return ts.astype(np.float32), accs, gyrs


def oracle_path(anchor, t0, a0, w0, ts, accs, gyrs, g):
    """Replays Compensator::upsample + State::update in float64."""
    R, p, v = np.asarray(anchor.R, np.float64), np.asarray(anchor.p, np.float64), np.asarray(anchor.v, np.float64)
    bg, ba = np.asarray(anchor.bg, np.float64), np.asarray(anchor.ba, np.float64)
    a_s, w_s = np.asarray(a0, np.float64), np.asarray(w0, np.float64)
    nodes = [(t0, R, p, v, a_s, w_s)]
    t_prev = t0
    for t, a, w in zip(ts, accs, gyrs):
        dt = t - t_prev
        acc_w = R @ (a - ba) + g
        p = p + v * dt + 0.5 * acc_w * dt * dt
        v = v + acc_w * dt
        R = R @ np_exp((w - bg) * dt)
        a_s = 0.5 * a_s + 0.5 * a
        w_s = 0.5 * w_s + 0.5 * w
        nodes.append((t, R, p, v, a_s.copy(), w_s.copy()))
        t_prev = t
    return nodes


def oracle_pose(nodes, anchor, tp, g):
    """Body pose (R_tp, p_tp) at tp: integrate the bracketing node with its
    smoothed controls (Compensator per-point path, f64)."""
    bg, ba = np.asarray(anchor.bg, np.float64), np.asarray(anchor.ba, np.float64)
    s = max(i for i, n in enumerate(nodes) if n[0] <= tp)
    t_s, R, p, v, a_s, w_s = nodes[s]
    dt = tp - t_s
    acc_w = R @ (a_s - ba) + g
    R_tp = R @ np_exp((w_s - bg) * dt)
    p_tp = p + v * dt + 0.5 * acc_w * dt * dt
    return R_tp, p_tp


def oracle_point(nodes, anchor, tp, p_lidar, g):
    """World position of a LiDAR-frame point observed at tp."""
    R_LI = np.asarray(anchor.R_LI, np.float64)
    t_LI = np.asarray(anchor.t_LI, np.float64)
    R_tp, p_tp = oracle_pose(nodes, anchor, tp, g)
    return R_tp @ (R_LI @ p_lidar + t_LI) + p_tp


class TestBuildPath:
    def test_nodes_match_oracle(self, rng):
        cfg = Config()
        anchor = st.make_initial(cfg)
        g = np.array(cfg.gravity_vec, np.float64)
        ts, accs, gyrs = make_imus(rng, 10, t0=5.0)
        win = ImuWindow(jnp.asarray(ts), jnp.asarray(accs), jnp.asarray(gyrs), jnp.ones(10, bool))
        a0 = np.array([0, 0, 9.807], np.float32)
        w0 = np.zeros(3, np.float32)
        path = build_path(anchor, 5.0, jnp.asarray(a0), jnp.asarray(w0), win)
        nodes = oracle_path(anchor, 5.0, a0, w0, ts, accs, gyrs, g)
        assert path.t.shape[0] == 11
        for i, (t, R, p, v, a_s, w_s) in enumerate(nodes):
            np.testing.assert_allclose(float(path.t[i]), t, atol=1e-6)
            np.testing.assert_allclose(np.asarray(path.R[i]), R, atol=1e-4)
            np.testing.assert_allclose(np.asarray(path.p[i]), p, atol=1e-4)
            np.testing.assert_allclose(np.asarray(path.a[i]), a_s, atol=1e-4)
            np.testing.assert_allclose(np.asarray(path.w[i]), w_s, atol=1e-4)

    def test_state_at_between_nodes(self, rng):
        cfg = Config()
        anchor = st.make_initial(cfg)
        g = np.array(cfg.gravity_vec, np.float64)
        ts, accs, gyrs = make_imus(rng, 10, t0=0.0)
        win = ImuWindow(jnp.asarray(ts), jnp.asarray(accs), jnp.asarray(gyrs), jnp.ones(10, bool))
        a0 = np.array([0, 0, 9.807], np.float32)
        w0 = np.zeros(3, np.float32)
        path = build_path(anchor, 0.0, jnp.asarray(a0), jnp.asarray(w0), win)
        nodes = oracle_path(anchor, 0.0, a0, w0, ts, accs, gyrs, g)
        t_q = 0.055  # between nodes 5 and 6
        R, p, v = state_at(path, anchor, t_q)
        # oracle: integrate node 5 with its smoothed controls
        p_ref = oracle_point(nodes, anchor, t_q, np.zeros(3), g)  # R_LI=I,t_LI=0
        np.testing.assert_allclose(np.asarray(p), p_ref, atol=1e-4)


class TestCompensate:
    def test_static_trajectory_identity(self, rng):
        """No motion, no gravity mismatch → deskew is the identity."""
        cfg = Config()
        anchor = st.make_initial(cfg)
        M = 10
        ts = (np.arange(M, dtype=np.float32) + 1) / 100.0
        a_rest = -np.array(cfg.gravity_vec, np.float32)
        win = ImuWindow(
            jnp.asarray(ts), jnp.tile(jnp.asarray(a_rest), (M, 1)),
            jnp.zeros((M, 3), jnp.float32), jnp.ones(M, bool),
        )
        path = build_path(anchor, 0.0, jnp.asarray(a_rest), jnp.zeros(3, jnp.float32), win)
        pts = rng.uniform(-5, 5, size=(100, 3)).astype(np.float32)
        pts_t = rng.uniform(0.0, 0.1, size=100).astype(np.float32)
        out = compensate(path, anchor, 0.1, jnp.asarray(pts), jnp.asarray(pts_t), jnp.ones(100, bool))
        np.testing.assert_allclose(np.asarray(out), pts, atol=1e-4)

    def test_moving_trajectory_vs_oracle(self, rng):
        cfg = Config(
            I_Rotation_L=tuple(Rsc.from_euler("z", 30, degrees=True).as_matrix().ravel().tolist()),
            I_Translation_L=(0.1, 0.0, -0.05),
        )
        anchor = st.make_initial(cfg)
        g = np.array(cfg.gravity_vec, np.float64)
        ts, accs, gyrs = make_imus(rng, 12, t0=1.0)
        win = ImuWindow(jnp.asarray(ts), jnp.asarray(accs), jnp.asarray(gyrs), jnp.ones(12, bool))
        a0 = np.array([0.3, -0.1, 9.9], np.float32)
        w0 = np.array([0.05, 0.1, -0.2], np.float32)
        path = build_path(anchor, 1.0, jnp.asarray(a0), jnp.asarray(w0), win)
        nodes = oracle_path(anchor, 1.0, a0, w0, ts, accs, gyrs, g)

        Np = 50
        pts = rng.uniform(-10, 10, size=(Np, 3)).astype(np.float32)
        pts_t = rng.uniform(1.0, 1.0 + 12 / 100.0, size=Np).astype(np.float32)
        t2 = 1.0 + 12 / 100.0
        out = np.asarray(
            compensate(path, anchor, t2, jnp.asarray(pts), jnp.asarray(pts_t), jnp.ones(Np, bool))
        )

        # oracle: world position of each point, then into lidar@t2 frame
        R_LI = np.asarray(anchor.R_LI, np.float64)
        t_LI = np.asarray(anchor.t_LI, np.float64)
        R_t2, p_t2 = oracle_pose(nodes, anchor, t2, g)
        for i in range(Np):
            pw = oracle_point(nodes, anchor, float(pts_t[i]), pts[i].astype(np.float64), g)
            pl2 = R_LI.T @ (R_t2.T @ (pw - p_t2) - t_LI)
            np.testing.assert_allclose(out[i], pl2, atol=2e-3)

    def test_points_at_padded_region_zeroed(self, rng):
        cfg = Config()
        anchor = st.make_initial(cfg)
        win = ImuWindow(
            jnp.asarray([0.01], jnp.float32), jnp.zeros((1, 3)), jnp.zeros((1, 3)),
            jnp.ones(1, bool),
        )
        path = build_path(anchor, 0.0, jnp.zeros(3), jnp.zeros(3), win)
        pts = rng.uniform(-1, 1, size=(4, 3)).astype(np.float32)
        mask = np.array([True, True, False, False])
        out = np.asarray(
            compensate(path, anchor, 0.01, jnp.asarray(pts),
                       jnp.full(4, 0.005, jnp.float32), jnp.asarray(mask))
        )
        np.testing.assert_allclose(out[2:], 0.0)


class TestPaddingInvariance:
    """r4 regression lock: deskew must be INVARIANT to bucket padding.

    _bracket used to mask invalid path nodes to -inf, which still count as
    <= q in the dense bracket sum — with trailing padding every index
    overshoots its true bracket, and at full-bucket padding every point
    collapses onto the terminal node: deskew silently no-ops on padded
    windows (production windows are ALWAYS padded).  The fix brackets on the
    CARRIED node times (invalid nodes replicate their predecessor)."""

    def _win(self, M, pad, pre=0):
        import jax.numpy as jnp

        from limovelo_tpu import Config
        from limovelo_tpu.filter.process import ImuWindow

        cfg = Config()
        g = np.array(cfg.gravity_vec, np.float32)
        ts = (np.arange(1, M + 1) * (0.1 / M)).astype(np.float32)
        if pre:
            ts = np.concatenate([ts[:pre] - 0.1, ts])
        a = np.tile(-g, (len(ts), 1)).astype(np.float32)
        w = np.tile(np.array([0, 0, 1.0], np.float32), (len(ts), 1))
        t_ = np.zeros(pad, np.float32)
        aa = np.zeros((pad, 3), np.float32)
        ww = np.zeros((pad, 3), np.float32)
        mk = np.zeros(pad, bool)
        Mn = len(ts)
        t_[:Mn] = ts
        aa[:Mn] = a
        ww[:Mn] = w
        mk[:Mn] = t_[:Mn] > 0
        return ImuWindow(jnp.asarray(t_), jnp.asarray(aa), jnp.asarray(ww),
                         jnp.asarray(mk))

    def test_padding_and_superset_invariant(self):
        from limovelo_tpu import Config
        from limovelo_tpu.deskew.compensate import build_path, compensate
        from limovelo_tpu.geometry import state as st

        cfg = Config()
        x = st.make_initial(cfg)
        g = np.array(cfg.gravity_vec, np.float32)
        pts = np.array([[5, 0, 0], [0, 5, 0], [3, 3, 1]], np.float32)
        pts_t = np.array([0.01, 0.05, 0.09], np.float32)
        msk = np.ones(3, bool)

        def run(imus):
            path = build_path(x, jnp.float32(0.0), jnp.asarray(-g),
                              jnp.zeros(3), imus)
            return np.asarray(compensate(path, x, jnp.float32(0.1),
                                         jnp.asarray(pts), jnp.asarray(pts_t),
                                         jnp.asarray(msk)))

        ref = run(self._win(8, 8))
        # the window actually rotates the points (deskew is ACTIVE)
        assert np.max(np.abs(ref - pts)) > 0.1, "deskew no-oped"
        for pad, pre in ((16, 0), (64, 0), (64, 4)):
            out = run(self._win(8, pad, pre))
            np.testing.assert_array_equal(out, ref)
