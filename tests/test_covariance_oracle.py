"""f64 MAP oracle for the iterated update — covariance parity (VERDICT r1 #8).

IKFoM's `update_iterated_dyn_share_modified` (SURVEY.md §2.10,
`/root/reference/src/Modules/Localizator.cpp:129-133`) is Gauss-Newton on the
manifold MAP objective

    ½‖h(x)‖²_{R⁻¹} + ½‖x ⊟ x_prop‖²_{P⁻¹}

with the prior transported through the manifold-chart Jacobian L (its
per-block `A_matrix` projections), and returns P⁺ = (HᵀR⁻¹H + LᵀP⁻¹L)⁻¹ in
the chart at the final iterate.  This file replicates that math in float64
NumPy/SciPy — manifold ops via scipy Rotation, chart Jacobian by central
finite differences (no shared code with the implementation under test) — and
requires `filter.update.iterated_update` to match state AND covariance.

The matcher is frozen (a `knn_fn` returning fixed neighbor sets) so both
sides optimize the identical objective.
"""

import numpy as np
import pytest
from scipy.spatial.transform import Rotation as Rsc

import jax
import jax.numpy as jnp

from limovelo_tpu.config import Config, DynParams, StaticConfig
from limovelo_tpu.filter.update import chart_transport, iterated_update
from limovelo_tpu.geometry import state as st
from limovelo_tpu.mapping import GridParams, make_map

# ---------------------------------------------------------------------------
# f64 NumPy manifold ops (independent implementations)
# ---------------------------------------------------------------------------

POS, ROT, EXT_R, EXT_T, VEL, BG, BA, GRAV = 0, 3, 6, 9, 12, 15, 18, 21


def np_exp(w):
    return Rsc.from_rotvec(np.asarray(w, np.float64)).as_matrix()


def np_log(R):
    return Rsc.from_matrix(np.asarray(R, np.float64)).as_rotvec()


def s2_basis(g):
    n = g / np.linalg.norm(g)
    ax = np.abs(n)
    if ax[2] <= ax[0] and ax[2] <= ax[1]:
        ref = np.array([0.0, 0.0, 1.0])
    elif ax[0] <= ax[1]:
        ref = np.array([1.0, 0.0, 0.0])
    else:
        ref = np.array([0.0, 1.0, 0.0])
    b1 = np.cross(n, ref)
    b1 /= np.linalg.norm(b1)
    b2 = np.cross(n, b1)
    return np.stack([b1, b2], axis=-1)  # (3,2)


def s2_boxplus(g, d2):
    w = s2_basis(g) @ d2
    return np_exp(w) @ g


def s2_boxminus(g1, g2):
    n1, n2 = g1 / np.linalg.norm(g1), g2 / np.linalg.norm(g2)
    axis = np.cross(n2, n1)
    s = np.linalg.norm(axis)
    c = np.clip(np.dot(n1, n2), -1.0, 1.0)
    theta = np.arctan2(s, c)
    w = axis * (1.0 if s < 1e-12 else theta / s)
    return s2_basis(g2).T @ w


class X:
    """Plain f64 state mirror of NavState."""

    def __init__(self, R, p, v, bg, ba, g, R_LI, t_LI):
        self.R, self.p, self.v = R, p, v
        self.bg, self.ba, self.g = bg, ba, g
        self.R_LI, self.t_LI = R_LI, t_LI

    @classmethod
    def from_nav(cls, x):
        f = lambda a: np.asarray(a, np.float64)
        return cls(f(x.R), f(x.p), f(x.v), f(x.bg), f(x.ba), f(x.g),
                   f(x.R_LI), f(x.t_LI))


def np_boxplus(x: X, dx) -> X:
    return X(
        R=x.R @ np_exp(dx[ROT:ROT + 3]),
        p=x.p + dx[POS:POS + 3],
        v=x.v + dx[VEL:VEL + 3],
        bg=x.bg + dx[BG:BG + 3],
        ba=x.ba + dx[BA:BA + 3],
        g=s2_boxplus(x.g, dx[GRAV:GRAV + 2]),
        R_LI=x.R_LI @ np_exp(dx[EXT_R:EXT_R + 3]),
        t_LI=x.t_LI + dx[EXT_T:EXT_T + 3],
    )


def np_boxminus(x1: X, x2: X):
    return np.concatenate([
        x1.p - x2.p,
        np_log(x2.R.T @ x1.R),
        np_log(x2.R_LI.T @ x1.R_LI),
        x1.t_LI - x2.t_LI,
        x1.v - x2.v,
        x1.bg - x2.bg,
        x1.ba - x2.ba,
        s2_boxminus(x1.g, x2.g),
    ])


def np_chart_transport(x: X, x0: X, eps=1e-6):
    """L = ∂((x ⊞ δ) ⊟ x0)/∂δ at 0, central finite differences."""
    L = np.zeros((23, 23))
    for j in range(23):
        d = np.zeros(23)
        d[j] = eps
        fp = np_boxminus(np_boxplus(x, d), x0)
        fm = np_boxminus(np_boxplus(x, -d), x0)
        L[:, j] = (fp - fm) / (2 * eps)
    return L


# ---------------------------------------------------------------------------
# f64 measurement model (same formulas as ops/planes + observation_matrix,
# re-derived here in straight NumPy)
# ---------------------------------------------------------------------------


def fit_plane_np(nb):
    """(k,3) neighbors → (normal, d) via Av = −1 least squares."""
    v = np.linalg.solve(nb.T @ nb + 1e-8 * np.eye(3), -nb.sum(axis=0))
    n = np.linalg.norm(v)
    return v / n, 1.0 / n


def measurement_np(x: X, pts_lidar, neighbors):
    """Residuals r (N,), Jacobian H (N,12) — Localizator::calculate_H rows."""
    N = pts_lidar.shape[0]
    H = np.zeros((N, 12))
    r = np.zeros(N)
    for i in range(N):
        n, d = fit_plane_np(neighbors[i])
        p_imu = x.R_LI @ pts_lidar[i] + x.t_LI
        p_glob = x.R @ p_imu + x.p
        r[i] = n @ p_glob + d
        Rt_n = x.R.T @ n
        H[i, 0:3] = n
        H[i, 3:6] = np.cross(p_imu, Rt_n)
        H[i, 6:9] = np.cross(pts_lidar[i], x.R_LI.T @ Rt_n)
        H[i, 9:12] = Rt_n
    return r, H


def oracle_update(x0: X, P, pts_lidar, neighbors, r_noise, limits, max_iters):
    """f64 manifold GN on the MAP objective — the IKFoM-equivalent update."""
    P_inv = np.linalg.inv(np.asarray(P, np.float64))
    x = x0
    done = False
    for _ in range(max_iters):
        if done:
            break
        r, H = measurement_np(x, pts_lidar, neighbors)
        HtH = H.T @ H
        Htr = H.T @ r
        L = np_chart_transport(x, x0)
        S = np.zeros((23, 23))
        S[:12, :12] = HtH / r_noise
        S += L.T @ P_inv @ L
        g = np.zeros(23)
        g[:12] = Htr / r_noise
        rhs = -(g + L.T @ P_inv @ np_boxminus(x, x0))
        delta = np.linalg.solve(S, rhs)
        x = np_boxplus(x, delta)
        done = np.max(np.abs(delta)) < limits
    _, H = measurement_np(x, pts_lidar, neighbors)
    L = np_chart_transport(x, x0)
    S = np.zeros((23, 23))
    S[:12, :12] = (H.T @ H) / r_noise
    S += L.T @ P_inv @ L
    P_new = np.linalg.inv(S)
    return x, 0.5 * (P_new + P_new.T)


# ---------------------------------------------------------------------------
# the synthetic problem
# ---------------------------------------------------------------------------


def make_problem(rng, N=64, k=5):
    cfg = Config()
    x0_nav = st.make_initial(cfg)
    # randomize the predicted state (away from identity so L ≠ I matters)
    dx0 = np.zeros(23)
    dx0[ROT:ROT + 3] = rng.normal(size=3) * 0.3
    dx0[POS:POS + 3] = rng.normal(size=3) * 2.0
    dx0[VEL:VEL + 3] = rng.normal(size=3) * 1.0
    dx0[GRAV:GRAV + 2] = rng.normal(size=2) * 0.05
    x0_nav = st.boxplus(x0_nav, jnp.asarray(dx0, jnp.float32))

    # prior covariance: SPD, pose-block dominant (like a real predict output)
    A = rng.normal(size=(23, 23)) * 0.002
    P = A @ A.T + np.diag(np.full(23, 1e-4))
    P[:6, :6] += np.eye(6) * 3e-3

    # true pose = x0 ⊞ (small error the update must recover)
    dtrue = np.zeros(23)
    dtrue[POS:POS + 3] = rng.normal(size=3) * 0.05
    dtrue[ROT:ROT + 3] = rng.normal(size=3) * 0.02
    x_true = np_boxplus(X.from_nav(x0_nav), dtrue)

    # lidar points + neighbor sets lying on planes through the true surface
    pts_lidar = rng.uniform(-8, 8, size=(N, 3)).astype(np.float32)
    neighbors = np.zeros((N, k, 3), np.float32)
    for i in range(N):
        p_glob = x_true.R @ (x_true.R_LI @ pts_lidar[i] + x_true.t_LI) + x_true.p
        n = rng.normal(size=3)
        n /= np.linalg.norm(n)
        # offset the plane so it passes near (not exactly through) the point
        b = np.linalg.svd(n[None])[2][1:]         # (2,3) tangent basis
        for j in range(k):
            nb = p_glob + b.T @ rng.uniform(-0.5, 0.5, size=2)
            nb += n * rng.normal() * 0.003
            neighbors[i, j] = nb
    return cfg, x0_nav, P.astype(np.float32), pts_lidar, neighbors


def frozen_knn(neighbors):
    nb = jnp.asarray(neighbors)
    N, k, _ = nb.shape

    def knn_fn(m, queries, grid, k=k, rings=1, max_buckets=None):
        sq = jnp.zeros((N, k), jnp.float32)       # passes the distance gate
        valid = jnp.ones((N, k), bool)
        return nb, sq, valid

    return knn_fn


STATIC = StaticConfig(
    MAX_NUM_ITERS=4,
    NUM_MATCH_POINTS=5,
    estimate_extrinsics=True,
    mapping_online=True,
    knn_rings=1,
    knn_max_buckets=None,
)
R_NOISE = 1e-3
LIMITS = 1e-4


def dyn_params():
    return DynParams(
        MAX_DIST_PLANE=jnp.float32(10.0),
        PLANES_THRESHOLD=jnp.float32(10.0),   # gates open: oracle models no gating
        plane_planarity=jnp.float32(1.0),     # junction gate off (oracle has none)
        plane_linearity=jnp.float32(0.0),     # collinearity gate off
        QUERY_THRESHOLD=jnp.float32(0.0),
        huber_delta=jnp.float32(0.0),         # pure least squares, like the oracle
        LiDAR_noise=jnp.float32(R_NOISE),
        degeneracy_threshold=jnp.float32(-1e6),  # gating off (oracle has none)
        LIMITS=jnp.float32(LIMITS),
        downsample_prec=jnp.float32(0.2),
        MAX_POINTS2MATCH=jnp.int32(10),
    )


class TestChartTransport:
    def test_matches_finite_differences(self, rng):
        cfg, x0_nav, P, pts, nbs = make_problem(rng)
        dx = np.zeros(23)
        dx[ROT:ROT + 3] = rng.normal(size=3) * 0.2
        dx[EXT_R:EXT_R + 3] = rng.normal(size=3) * 0.1
        dx[GRAV:GRAV + 2] = rng.normal(size=2) * 0.1
        dx[POS:POS + 3] = rng.normal(size=3)
        x_nav = st.boxplus(x0_nav, jnp.asarray(dx, jnp.float32))
        L_dev = np.asarray(chart_transport(x_nav, x0_nav))
        L_np = np_chart_transport(X.from_nav(x_nav), X.from_nav(x0_nav), eps=1e-5)
        np.testing.assert_allclose(L_dev, L_np, atol=3e-4)

    def test_identity_at_origin(self, rng):
        cfg, x0_nav, _, _, _ = make_problem(rng)
        L = np.asarray(chart_transport(x0_nav, x0_nav))
        np.testing.assert_allclose(L, np.eye(23), atol=1e-5)


class TestCovarianceOracle:
    @pytest.mark.parametrize("seed", [0, 1, 2])
    def test_state_and_covariance_match_oracle(self, seed):
        rng = np.random.default_rng(seed)
        cfg, x0_nav, P, pts_lidar, neighbors = make_problem(rng)
        grid = GridParams(table_size=64, coarse_factor=4, voxel_size=0.2,
                          probe_length=4)
        m = make_map(grid)
        mask = jnp.ones(len(pts_lidar), bool)

        knn_fn = frozen_knn(neighbors)
        run = jax.jit(
            lambda x0, Pm, m_, p, msk: iterated_update(
                x0, Pm, m_, p, msk, grid, STATIC, dyn_params(), knn_fn=knn_fn
            )
        )
        x_dev, P_dev, diag = run(
            x0_nav, jnp.asarray(P), m, jnp.asarray(pts_lidar), mask
        )
        assert int(diag.num_matches) == len(pts_lidar)

        x_or, P_or = oracle_update(
            X.from_nav(x0_nav), P, np.asarray(pts_lidar, np.float64),
            np.asarray(neighbors, np.float64), R_NOISE, LIMITS,
            STATIC.MAX_NUM_ITERS,
        )

        # state parity (f32 vs f64): sub-mm / tens-of-µrad
        np.testing.assert_allclose(np.asarray(x_dev.p), x_or.p, atol=2e-3)
        np.testing.assert_allclose(np.asarray(x_dev.R), x_or.R, atol=5e-4)
        np.testing.assert_allclose(np.asarray(x_dev.v), x_or.v, atol=2e-3)

        # covariance parity: the round-1 gap — P⁺ must carry the manifold
        # chart transport, not just the information-form inverse
        P_dev = np.asarray(P_dev, np.float64)
        rel = np.linalg.norm(P_dev - P_or) / np.linalg.norm(P_or)
        assert rel < 5e-3, f"P⁺ relative error {rel:.2e}"
        # diagonal agreement (variances drive downstream gating)
        np.testing.assert_allclose(
            np.diag(P_dev), np.diag(P_or), rtol=2e-2, atol=1e-9
        )
