"""Iterated update: known pose perturbation against a planar map must
converge back (the estimator-in-isolation test)."""

import numpy as np
import pytest

import jax.numpy as jnp

from limovelo_tpu import Config
from limovelo_tpu.filter.update import iterated_update, observation_matrix
from limovelo_tpu.geometry import so3, state as st
from limovelo_tpu.mapping import GridParams, insert, make_map

GRID = GridParams(table_size=1 << 13, coarse_factor=4, voxel_size=0.2, probe_length=8)


def make_box_world(rng, n=6000, half=8.0):
    """Points on the inside of a box (floor/ceiling/4 walls)."""
    pts = []
    n6 = n // 6
    u = lambda: rng.uniform(-half, half, size=(n6, 2))
    for axis, sign in [(0, -1), (0, 1), (1, -1), (1, 1), (2, -1), (2, 1)]:
        uv = u()
        p = np.zeros((n6, 3))
        other = [i for i in range(3) if i != axis]
        p[:, other[0]] = uv[:, 0]
        p[:, other[1]] = uv[:, 1]
        p[:, axis] = sign * half
        pts.append(p)
    return np.concatenate(pts).astype(np.float32)


@pytest.fixture(scope="module")
def box_map(rng=None):
    rng = np.random.default_rng(11)
    pts = make_box_world(rng)
    m = make_map(GRID)
    m = insert(m, jnp.asarray(pts), jnp.ones(len(pts), bool), GRID)
    return m, pts


def scan_from_pose(rng, world_pts, R, p, n=800, max_range=20.0):
    """Pick visible world points, express them in the sensor (=body) frame."""
    idx = rng.choice(len(world_pts), size=n, replace=False)
    w = world_pts[idx].astype(np.float64)
    local = (w - p) @ R  # Rᵀ(w−p)
    return local.astype(np.float32)


class TestIteratedUpdate:
    def test_converges_from_offset(self, rng, box_map):
        m, world_pts = box_map
        cfg = Config(degeneracy_threshold=0.0, LiDAR_noise=0.001)
        # true pose: identity at center; predicted: offset by 20cm + 3deg
        x_true = st.make_initial(cfg)
        scan = scan_from_pose(rng, world_pts, np.eye(3), np.zeros(3))

        dx = np.zeros(23, np.float32)
        dx[0:3] = [0.15, -0.12, 0.08]
        dx[3:6] = [0.03, -0.02, 0.04]
        x0 = st.boxplus(x_true, jnp.asarray(dx))
        P = st.initial_covariance()

        x_new, P_new, diag = iterated_update(
            x0, P, m, jnp.asarray(scan), jnp.ones(len(scan), bool), GRID,
            cfg.static(), cfg.dynamic()
        )
        # recovered pose ≈ identity
        p_err = np.linalg.norm(np.asarray(x_new.p))
        r_err = np.linalg.norm(np.asarray(so3.log(x_new.R)))
        assert p_err < 0.03, f"position error {p_err:.3f}"
        assert r_err < 0.01, f"rotation error {r_err:.4f}"
        assert int(diag.num_matches) > 400
        # covariance contracted on observed directions
        assert np.trace(np.asarray(P_new)[:3, :3]) < np.trace(np.asarray(P)[:3, :3])

    def test_no_matches_is_identity(self, rng):
        cfg = Config(degeneracy_threshold=0.0)
        m = make_map(GRID)  # empty map
        x0 = st.make_initial(cfg)
        P = st.initial_covariance()
        scan = rng.uniform(-5, 5, size=(256, 3)).astype(np.float32)
        x_new, P_new, diag = iterated_update(
            x0, P, m, jnp.asarray(scan), jnp.ones(256, bool), GRID,
            cfg.static(), cfg.dynamic()
        )
        assert int(diag.num_matches) == 0
        np.testing.assert_allclose(np.asarray(x_new.p), np.asarray(x0.p), atol=1e-5)
        np.testing.assert_allclose(np.asarray(x_new.R), np.asarray(x0.R), atol=1e-5)
        np.testing.assert_allclose(np.asarray(P_new), np.asarray(P), atol=1e-3)

    def test_degeneracy_gating_freezes_weak_directions(self, rng):
        """Single ground plane: only z/roll/pitch observable; with a huge
        threshold the whole pose update is suppressed."""
        cfg_open = Config(degeneracy_threshold=0.0, LiDAR_noise=0.001)
        cfg_gated = Config(degeneracy_threshold=1e9, LiDAR_noise=0.001)
        # ground at z=-0.5: a plane through the origin (D=0) is unrepresentable
        # in the reference's Av=-1 parametrization (Utils.cpp:32-57) — ours
        # matches that behavior, so keep the test plane off-origin
        plane_pts = np.stack(
            [rng.uniform(-8, 8, 4000), rng.uniform(-8, 8, 4000), np.full(4000, -0.5)],
            axis=1,
        ).astype(np.float32)
        m = make_map(GRID)
        m = insert(m, jnp.asarray(plane_pts), jnp.ones(4000, bool), GRID)

        x_true = st.make_initial(Config())
        x_true = st.boxplus(x_true, jnp.asarray(np.r_[0, 0, 1.5, np.zeros(20)], np.float32))
        scan = scan_from_pose(rng, plane_pts, np.eye(3), np.array([0, 0, 1.5]), n=600)
        dx = np.zeros(23, np.float32)
        dx[2] = 0.3  # z offset — observable from the ground plane
        x0 = st.boxplus(x_true, jnp.asarray(dx))
        P = st.initial_covariance()

        x_open, _, _ = iterated_update(
            x0, P, m, jnp.asarray(scan), jnp.ones(600, bool), GRID,
            cfg_open.static(), cfg_open.dynamic()
        )
        x_gated, _, _ = iterated_update(
            x0, P, m, jnp.asarray(scan), jnp.ones(600, bool), GRID,
            cfg_gated.static(), cfg_gated.dynamic()
        )
        # open: z recovered toward 1.5; gated: frozen at 1.8
        assert abs(float(x_open.p[2]) - 1.5) < 0.1
        assert abs(float(x_gated.p[2]) - 1.8) < 0.05

    def test_observation_matrix_fd(self, rng):
        """H rows vs finite differences of the residual in the error chart."""
        cfg = Config(estimate_extrinsics=True)
        x = st.make_initial(cfg)
        x = st.boxplus(x, jnp.asarray(rng.normal(size=23) * 0.2, jnp.float32))
        pts_l = rng.uniform(-5, 5, size=(8, 3)).astype(np.float32)
        normals = rng.normal(size=(8, 3))
        normals /= np.linalg.norm(normals, axis=-1, keepdims=True)
        normals = normals.astype(np.float32)
        d = rng.uniform(0.5, 2.0, size=8).astype(np.float32)

        H = np.asarray(observation_matrix(x, jnp.asarray(pts_l), jnp.asarray(normals), True))

        def residual(xs):
            Rwl = np.asarray(xs.R) @ np.asarray(xs.R_LI)
            twl = np.asarray(xs.p) + np.asarray(xs.R) @ np.asarray(xs.t_LI)
            pg = pts_l @ Rwl.T + twl
            return (pg * normals).sum(-1) + d

        eps = 1e-4
        for k in list(range(0, 12)):
            e = np.zeros(23, np.float32)
            e[k] = eps
            rp = residual(st.boxplus(x, jnp.asarray(e)))
            rm = residual(st.boxplus(x, jnp.asarray(-e)))
            fd = (rp - rm) / (2 * eps)
            np.testing.assert_allclose(H[:, k], fd, atol=5e-2, err_msg=f"column {k}")


class TestMatchCadence:
    """match_mode coverage (ADVICE r3): "auto" is the production default via
    Config.derived(), but direct StaticConfig constructions default to
    "rematch" — exercise the auto path explicitly."""

    def _setup(self, rng, box_map, mode, **cfg_kw):
        m, world_pts = box_map
        cfg = Config(degeneracy_threshold=0.0, LiDAR_noise=0.001,
                     match_mode=mode, **cfg_kw)
        x_true = st.make_initial(cfg)
        scan = scan_from_pose(rng, world_pts, np.eye(3), np.zeros(3))
        return m, cfg, x_true, scan

    def test_auto_equals_rematch_steady_state(self, rng, box_map):
        """Converged steady state: the iterate never moves further than
        match_refresh_m, so "auto" pays ONE search and must agree with the
        full rematch cadence to sub-mm / a few hundredths of a degree."""
        m, cfg_a, x_true, scan = self._setup(rng, box_map, "auto")
        cfg_r = Config(degeneracy_threshold=0.0, LiDAR_noise=0.001,
                       match_mode="rematch")
        # tiny perturbation: a 2 mm / 0.1 deg offset (converged tracking)
        dx = np.zeros(23, np.float32)
        dx[0:3] = [0.002, -0.001, 0.001]
        dx[3:6] = [0.001, 0.0, -0.001]
        x0 = st.boxplus(x_true, jnp.asarray(dx))
        P = st.initial_covariance()
        args = (P, m, jnp.asarray(scan), jnp.ones(len(scan), bool), GRID)
        xa, _, da = iterated_update(x0, *args, cfg_a.static(), cfg_a.dynamic())
        xr, _, dr = iterated_update(x0, *args, cfg_r.static(), cfg_r.dynamic())
        # match sets may differ by a borderline-gate point or two: auto's
        # final gates run against the neighbors found at x0, rematch's
        # against a fresh search at the final iterate
        assert abs(int(da.num_matches) - int(dr.num_matches)) <= 3
        np.testing.assert_allclose(np.asarray(xa.p), np.asarray(xr.p), atol=5e-4)
        np.testing.assert_allclose(np.asarray(xa.R), np.asarray(xr.R), atol=2e-4)

    def test_auto_refreshes_on_large_correction(self, rng, box_map):
        """A 0.5 m initial offset (≫ match_refresh_m=0.1) must trigger the
        auto-mode re-search: the result stays within the rematch cadence's
        convergence basin instead of freezing the stale neighbor sets."""
        m, cfg_a, x_true, scan = self._setup(rng, box_map, "auto")
        cfg_f = Config(degeneracy_threshold=0.0, LiDAR_noise=0.001,
                       match_mode="freeze")
        cfg_r = Config(degeneracy_threshold=0.0, LiDAR_noise=0.001,
                       match_mode="rematch")
        dx = np.zeros(23, np.float32)
        dx[0:3] = [0.5, -0.3, 0.2]
        dx[3:6] = [0.04, -0.03, 0.05]
        x0 = st.boxplus(x_true, jnp.asarray(dx))
        P = st.initial_covariance()
        args = (P, m, jnp.asarray(scan), jnp.ones(len(scan), bool), GRID)
        xa, _, _ = iterated_update(x0, *args, cfg_a.static(), cfg_a.dynamic())
        xr, _, _ = iterated_update(x0, *args, cfg_r.static(), cfg_r.dynamic())
        pa = np.linalg.norm(np.asarray(xa.p))
        pr = np.linalg.norm(np.asarray(xr.p))
        # auto tracks rematch closely (the refresh fired)...
        assert abs(pa - pr) < 0.02, f"auto {pa:.4f} vs rematch {pr:.4f}"
        assert pa < 0.05, f"auto did not converge: {pa:.4f}"
