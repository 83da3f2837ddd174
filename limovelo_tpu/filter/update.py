"""Iterated error-state measurement update (point-to-plane).

TPU-native replacement for IKFoM's `update_iterated_dyn_share_modified` +
`h_share_model` callback chain (SURVEY.md §2.10) and
`Localizator::calculate_H` (`/root/reference/src/Modules/Localizator.cpp:
29-57`).  The reference's control flow is inverted — the filter calls back up
into Mapper/Localizator each iteration; here the ≤`MAX_NUM_ITERS` Gauss-Newton
iterations explicitly interleave match → Jacobians → solve → ⊞ inside one
jitted function (SURVEY.md §7 design stance).

Update math (information form — algebraically the FAST-LIO2 iterated update):

    dx_j = x_j ⊟ x0                       (error w.r.t. the predicted state)
    L_j  = ∂((x_j ⊞ δ) ⊟ x0)/∂δ |_{δ=0}   (manifold-chart transport — IKFoM's
                                           per-block A-matrix projection)
    minimize ½‖r_j + Hδ‖²_{R⁻¹} + ½‖dx_j + L_jδ‖²_{P⁻¹}
    ⇒ (HᵀR⁻¹H + L_jᵀP⁻¹L_j) δ = −(HᵀR⁻¹ r_j + L_jᵀP⁻¹ dx_j)
    x_{j+1} = x_j ⊞ δ ;  converged when max|δ| < LIMITS
    P⁺ = (HᵀR⁻¹H + LᵀP⁻¹L)⁻¹  at the final iterate — the posterior covariance
    in the chart at x⁺ (which the next predict uses as reference), matching
    IKFoM's final L·(I−KH)P̃·Lᵀ up to algebra.  Verified against an f64 MAP
    oracle in tests/test_covariance_oracle.py.

H rows (N×12, remaining 11 columns zero — Localizator.cpp:29-57):
    cols 0-2   ∂r/∂pos      = nᵀ
    cols 3-5   ∂r/∂rot      = (p_imu × (Rᵀn))ᵀ
    cols 6-8   ∂r/∂extr_R   = (p_lidar × (R_LIᵀ Rᵀ n))ᵀ   (if estimate_extrinsics)
    cols 9-11  ∂r/∂extr_t   = (Rᵀn)ᵀ                       (if estimate_extrinsics)
with r = signed point-to-plane distance of the globally-placed point.

The HᵀR⁻¹H / HᵀR⁻¹r reductions are exact sums over points → shardable with a
`psum` (SURVEY.md §2 parallelism table); see parallel/sharding.py.

Degeneracy gating (the Huguet57 IKFoM-fork extension, Localizator.cpp:132):
eigendecompose the 12×12 HᵀH; update components along eigen-directions with
λ < degeneracy_threshold are zeroed (LOAM-style solution remapping).
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

from ..geometry import so3
from ..geometry.state import ERROR_DIM, NavState, boxminus, boxplus
from ..mapping import GridParams, HashGridMap, knn
from ..ops.planes import fit_planes, point_plane_distance


class UpdateDiagnostics(NamedTuple):
    num_matches: jnp.ndarray    # () int32 — valid matches at final iteration
    mean_residual: jnp.ndarray  # () mean |point-plane distance| over matches
    eigenvalues: jnp.ndarray    # (12,) of HᵀH at final iteration
    delta_norm: jnp.ndarray     # () max|δ| at final iteration
    iterations: jnp.ndarray     # () int32 — GN iterations actually applied
    # final-iteration matched planes, for the /limovelo/planes analog
    # (Publishers.hpp:92-116); stay on device unless a plane sink is attached
    plane_normals: jnp.ndarray   # (N,3) world-frame unit normals
    plane_centroids: jnp.ndarray # (N,3) world-frame neighbor centroids
    plane_valid: jnp.ndarray     # (N,) match chosen


def observation_matrix(
    x: NavState,
    pts_lidar: jnp.ndarray,     # (N,3) deskewed points, LiDAR frame @ t2
    normals: jnp.ndarray,       # (N,3) matched plane normals (world frame)
    estimate_extrinsics: bool,
) -> jnp.ndarray:
    """Rows of H (N×12) exactly as `Localizator::calculate_H`."""
    N = pts_lidar.shape[0]
    Rt_n = jnp.einsum("ji,nj->ni", x.R, normals)                 # Rᵀ n
    p_imu = jnp.einsum("ij,nj->ni", x.R_LI, pts_lidar) + x.t_LI  # lidar→imu
    A = jnp.cross(p_imu, Rt_n)                                   # ∂/∂rot
    H = jnp.concatenate([normals, A], axis=-1)                   # (N,6)
    if estimate_extrinsics:
        LiRt_n = jnp.einsum("ji,nj->ni", x.R_LI, Rt_n)           # R_LIᵀ Rᵀ n
        B = jnp.cross(pts_lidar, LiRt_n)
        H = jnp.concatenate([H, B, Rt_n], axis=-1)               # (N,12)
    else:
        H = jnp.concatenate([H, jnp.zeros((N, 6), H.dtype)], axis=-1)
    return H


def _eigh_spd(S: jnp.ndarray):
    """Eigendecomposition of a symmetric PSD matrix with a relative floor on
    the eigenvalues (guards f32 rounding noise producing tiny negatives).

    Used in place of LU-based `jnp.linalg.solve`/`inv` throughout the update:
    every system solved here (P, S = HᵀR⁻¹H + LᵀP⁻¹L) is symmetric positive
    definite, `eigh` on TPU lowers to a Jacobi sweep of fused elementwise/
    matmul work (no scalar-indexed inner loop like blocked LU — measured 250×
    faster through this environment's device runtime), and one decomposition
    serves both the GN step solve and the posterior covariance."""
    lam, V = jnp.linalg.eigh(S)
    lam = jnp.maximum(lam, 1e-12 * jnp.max(jnp.abs(lam)))
    return lam, V


def _solve_spd(S: jnp.ndarray, rhs: jnp.ndarray) -> jnp.ndarray:
    lam, V = _eigh_spd(S)
    return V @ ((V.T @ rhs) / lam)


def _inv_spd(S: jnp.ndarray) -> jnp.ndarray:
    lam, V = _eigh_spd(S)
    return (V / lam[None, :]) @ V.T


def chart_transport(x: NavState, x0: NavState, dtype=jnp.float32) -> jnp.ndarray:
    """L = ∂((x ⊞ δ) ⊟ x0)/∂δ at δ=0 — the (23,23) Jacobian transporting the
    prior chart (centered at the predicted x0, where P lives) to the chart at
    the current iterate x.

    IKFoM computes this block-by-block with its `A_matrix` projections inside
    `update_iterated_dyn_share_modified`; the compound manifold makes L
    block-diagonal (identity on ℝⁿ blocks, inverse right Jacobians on SO(3)
    blocks, a 2×2 on the S² gravity block).  Forward-mode autodiff through
    ⊞/⊟ yields exactly those blocks with no hand-derived formulas — 23 tiny
    jvps, negligible next to the KNN gather."""
    f = lambda d: boxminus(boxplus(x, d), x0)
    return jax.jacfwd(f)(jnp.zeros(ERROR_DIM, dtype))


def _place_global(x: NavState, pts_lidar: jnp.ndarray) -> jnp.ndarray:
    """LiDAR-frame window → world frame with the current estimate."""
    return (
        jnp.einsum("ij,nj->ni", x.R, jnp.einsum("ij,nj->ni", x.R_LI, pts_lidar) + x.t_LI)
        + x.p
    )


def _search(
    x: NavState,
    m: HashGridMap,
    pts_lidar: jnp.ndarray,
    grid: GridParams,
    static_cfg,
    knn_fn=None,
):
    """The KNN half of the match: place globally, query the map.
    Returns (p_glob, neighbors (N,k,3), sq (N,k), nb_valid (N,k))."""
    p_glob = _place_global(x, pts_lidar)
    if knn_fn is None and getattr(static_cfg, "knn_backend", "xla") == "pallas":
        # grouped-DMA Pallas kernel (1-ring envelope; config.knn_backend) —
        # measured 1.26x over the XLA gather on dense raw clouds (TPU v5e)
        from ..ops.pallas.knn import knn_grouped

        nb, sq, nb_valid = knn_grouped(
            m, p_glob, grid, k=static_cfg.NUM_MATCH_POINTS
        )
    else:
        nb, sq, nb_valid = (knn_fn or knn)(
            m, p_glob, grid, k=static_cfg.NUM_MATCH_POINTS,
            rings=static_cfg.knn_rings,
            max_buckets=getattr(static_cfg, "knn_max_buckets", None),
        )
    return p_glob, nb, sq, nb_valid


def _fit(nb, sq, nb_valid, dyn):
    return fit_planes(nb, sq, nb_valid, dyn.MAX_DIST_PLANE, dyn.PLANES_THRESHOLD,
                      planarity=getattr(dyn, "plane_planarity", 0.12),
                      linearity=getattr(dyn, "plane_linearity", 0.04))


def _gate(p_glob, fit, mask, dyn):
    """State-dependent gates + residual, common to both match modes."""
    r = point_plane_distance(p_glob, fit)
    valid = fit.valid & mask
    # query-residual gate (config.QUERY_THRESHOLD, 0 = off): the query must
    # lie on the fitted plane about as well as the neighbors do, else the
    # "plane" is a diagonal artifact of a two-surface neighbor set
    qt = getattr(dyn, "QUERY_THRESHOLD", None)
    if qt is not None:
        valid = valid & ((qt <= 0.0) | (jnp.abs(r) < qt))
    return r, valid


def _match(
    x: NavState,
    m: HashGridMap,
    pts_lidar: jnp.ndarray,
    mask: jnp.ndarray,
    grid: GridParams,
    static_cfg,
    dyn,
    knn_fn=None,
):
    """`Mapper::match` (Mapper.cpp:40-56): place the window globally with the
    current estimate, KNN each point, fit planes, gate."""
    p_glob, nb, sq, nb_valid = _search(x, m, pts_lidar, grid, static_cfg, knn_fn)
    fit = _fit(nb, sq, nb_valid, dyn)
    r, valid = _gate(p_glob, fit, mask, dyn)
    return r, fit, valid


def _match_frozen(x: NavState, pts_lidar, nb, nb_valid, fit, mask, dyn):
    """The frozen-neighbor per-iteration half (`match_mode` "freeze"/"auto"):
    re-place the window with the CURRENT iterate and re-evaluate residuals
    and the state-dependent gates against previously-found neighbor sets.

    The plane geometry (centroid/normal/planarity gates) depends only on the
    neighbors, so it is fitted once per search; what must track the iterate
    are the signed residual, the MAX_DIST_PLANE proximity gate
    (Plane.cpp:40-43 gates on the CURRENT query position), and the query-
    residual gate.  All O(N·k) elementwise — no map gather."""
    p_glob = _place_global(x, pts_lidar)
    d2 = jnp.sum((nb - p_glob[:, None, :]) ** 2, axis=-1)
    worst = jnp.max(jnp.where(nb_valid, d2, jnp.inf), axis=-1)
    close = worst < dyn.MAX_DIST_PLANE * dyn.MAX_DIST_PLANE
    r, valid = _gate(p_glob, fit, mask & close, dyn)
    return r, valid


def _displacement_bound(x: NavState, xs: NavState, max_range) -> jnp.ndarray:
    """Upper bound on how far ANY window point's global placement moved
    between iterates `xs` (where the last KNN search ran) and `x`:
    ‖Δp‖ + ‖Δt_LI‖ + (θ(ΔR) + θ(ΔR_LI))·max_range.  Drives the "auto"
    match-refresh decision — staleness of a frozen neighbor set is bounded
    by exactly this displacement."""
    dp = jnp.linalg.norm(x.p - xs.p)
    dtl = jnp.linalg.norm(x.t_LI - xs.t_LI)
    th = jnp.linalg.norm(so3.log(jnp.swapaxes(xs.R, -1, -2) @ x.R))
    th_li = jnp.linalg.norm(so3.log(jnp.swapaxes(xs.R_LI, -1, -2) @ x.R_LI))
    # placement is R·(R_LI·p + t_LI) + t: a body-rotation change also swings
    # the rotated extrinsic lever arm, so the rotated-vector norm bound is
    # max_range + ‖t_LI‖ (ADVICE r3: without it the bound under-estimates
    # and can skip a refresh the invariant promises)
    lever = max_range + jnp.linalg.norm(x.t_LI)
    return dp + dtl + (th + th_li) * lever


def iterated_update(
    x0: NavState,
    P: jnp.ndarray,
    m: HashGridMap,
    pts_lidar: jnp.ndarray,     # (N,3) deskewed window, LiDAR frame @ t2
    mask: jnp.ndarray,          # (N,)
    grid: GridParams,
    static_cfg,                 # config.StaticConfig (structure, static)
    dyn,                        # config.DynParams (thresholds, traced)
    axis_name: str | None = None,
    knn_fn=None,
) -> Tuple[NavState, jnp.ndarray, UpdateDiagnostics]:
    """Run the full iterated update; returns (x⁺, P⁺, diagnostics).

    With `axis_name` set (inside `shard_map`), the window is point-sharded
    across devices: each device matches its own shard and the Gauss-Newton
    normal equations HᵀR⁻¹H / HᵀR⁻¹r — exact sums over points — are reduced
    with a `psum`, making the update bit-identical to the single-device one
    (SURVEY.md §2 parallelism table: lossless point-batch sharding).

    `knn_fn` swaps the map query (same signature as `mapping.knn`) — used by
    the map-sharded path (parallel/map_sharding.py ring KNN).
    """
    dtype = pts_lidar.dtype
    psum = (lambda v: jax.lax.psum(v, axis_name)) if axis_name else (lambda v: v)
    r_inv = 1.0 / dyn.LiDAR_noise               # measurement information
    # the 23×23 prior/solve chain runs in f64 by default
    # (StaticConfig.solve_dtype): the GN fixed point sits close enough to
    # machine-f32 that backend codegen differences (AVX512 vs AVX2 FMA
    # contraction, TPU vs CPU) flipped the SIGN of extrinsic-calibration
    # progress between machines (VERDICT r4 #2).  Only the tiny matrices are
    # promoted — HᵀH stays an f32 MXU reduction; cost is µs-scale.
    use_f64 = getattr(static_cfg, "solve_dtype", "f64") == "f64"
    solve_t = jnp.float64 if use_f64 else jnp.float32
    with jax.enable_x64(use_f64):
        P_inv = _inv_spd(P.astype(solve_t))
    eps_limit = dyn.LIMITS

    # match cadence (Config.match_mode):
    #   "rematch": KNN search every GN iteration (reference IKFoM cadence).
    #   "freeze":  search ONCE at the predicted state; iterations re-evaluate
    #              residuals/gates against the frozen neighbor sets.
    #   "auto":    like freeze, but RE-search (lax.cond — the gather only
    #              executes when taken) whenever the iterate's placement has
    #              moved more than dyn.match_refresh_m since the last search
    #              (_displacement_bound).  Converged steady-state steps pay
    #              one gather; large-correction steps (cold start, online
    #              extrinsic calibration, degraded prediction) restore the
    #              full rematch fidelity automatically.
    mode = getattr(static_cfg, "match_mode", "rematch")
    search_state = None
    if mode in ("freeze", "auto"):
        _, nb0, sq0, nbv0 = _search(x0, m, pts_lidar, grid, static_cfg, knn_fn)
        search_state = (x0, nb0, nbv0, _fit(nb0, sq0, nbv0, dyn))
        max_range = jnp.max(
            jnp.where(mask, jnp.linalg.norm(pts_lidar, axis=-1), 0.0)
        )
        if axis_name:
            # point-sharded window: the refresh predicate feeds a lax.cond
            # whose branch (ring KNN) contains collectives — every device
            # must take the same branch.  Reduce the only shard-local input
            # so the predicate is uniform (ADVICE r3 high).
            max_range = jax.lax.pmax(max_range, axis_name)

    def maybe_refresh(x, search_state):
        """auto-mode re-search decision (traced bool → lax.cond)."""
        xs = search_state[0]
        need = _displacement_bound(x, xs, max_range) > dyn.match_refresh_m

        def refresh(_):
            _, nb, sq, nbv = _search(x, m, pts_lidar, grid, static_cfg, knn_fn)
            return (x, nb, nbv, _fit(nb, sq, nbv, dyn))

        return jax.lax.cond(need, refresh, lambda s: s, search_state)

    def gn_iteration(carry, _):
        if mode == "rematch":
            x, done, it = carry
            r, fit, valid = _match(x, m, pts_lidar, mask, grid, static_cfg, dyn, knn_fn)
        else:
            x, done, it, search_state = carry
            if mode == "auto":
                search_state = maybe_refresh(x, search_state)
            _, nb, nbv, fit = search_state
            r, valid = _match_frozen(x, pts_lidar, nb, nbv, fit, mask, dyn)
        w = valid.astype(dtype)
        # robust IRLS weight (config.huber_delta, 0 = plain least squares):
        # |r| beyond delta contributes gradient delta·sign(r) instead of r —
        # junction pseudo-planes (ops/planes.py) produce 50-100 mm artifacts
        # against a 1-30 mm inlier band; Huber keeps their influence bounded
        # while still letting large genuine innovations pull (a hard gate
        # measurably locks in drift).  Weights recompute every GN iteration.
        hd = getattr(dyn, "huber_delta", None)
        if hd is not None:
            w = w * jnp.where(
                hd > 0.0,
                jnp.minimum(1.0, hd / jnp.maximum(jnp.abs(r), 1e-9)),
                1.0,
            )
        H = observation_matrix(x, pts_lidar, fit.normal, static_cfg.estimate_extrinsics)
        Hw = H * w[:, None]

        HtH = psum(Hw.T @ H)                             # (12,12), MXU
        Htr = psum(Hw.T @ (r * w))                       # (12,)

        # prior transported into the chart at the current iterate (IKFoM's
        # A-matrix projection); L = I at the first iteration (x == x0).
        # L and dx_prior are computed in f32 (their accuracy is limited by the
        # f32 states themselves; also so3.log's argmax breaks under a local
        # x64 scope — internal init constants get canonicalized); the 23×23
        # LINEAR ALGEBRA runs at solve_dtype (f64 default — see above).
        L = chart_transport(x, x0, dtype)
        dx_prior = boxminus(x, x0)
        with jax.enable_x64(use_f64):
            L_s = L.astype(solve_t)
            LtPinv = L_s.T @ P_inv
            S = jnp.zeros((ERROR_DIM, ERROR_DIM), solve_t)
            S = S.at[:12, :12].set(HtH.astype(solve_t) * r_inv)
            S = S + LtPinv @ L_s
            g_vec = jnp.zeros((ERROR_DIM,), solve_t).at[:12].set(
                Htr.astype(solve_t) * r_inv)
            rhs = -(g_vec + LtPinv @ dx_prior.astype(solve_t))
            delta = _solve_spd(S, rhs)
        delta = delta.astype(dtype)

        # degeneracy gating on the unwhitened HᵀH spectrum (the Huguet57
        # fork extension, Localizator.cpp:132).  Compiled out entirely when
        # gating is off and nothing prints eigenvalues — the 12×12 eigh is
        # an iterative on-device loop paid once per GN iteration.
        if getattr(static_cfg, "compute_degeneracy", True):
            eigval, eigvec = jnp.linalg.eigh(HtH)
            strong = (eigval >= dyn.degeneracy_threshold).astype(dtype)
            # remap the observable block: drop components along weak directions
            d12 = eigvec.T @ delta[:12]
            delta = delta.at[:12].set(eigvec @ (d12 * strong))
        else:
            eigval = jnp.zeros((12,), dtype)

        x_new = boxplus(x, delta)
        x = jax.tree.map(lambda n, o: jnp.where(done, o, n), x_new, x)

        max_d = jnp.max(jnp.abs(delta))
        newly_done = max_d < eps_limit
        it = it + jnp.where(done, 0, 1)
        done = done | newly_done
        # thread the per-iteration share struct out: the LAST iteration's is
        # the final iterate's match (once `done` the state freezes but the
        # match still runs at it), so P⁺ and the diagnostics reuse it
        # instead of paying a 4th full match/KNN pass (the reference's
        # IKFoM likewise reuses the last share struct, Localizator.cpp:129-133)
        out = (valid, r, eigval, max_d, HtH, fit.normal, fit.centroid)
        if mode == "rematch":
            return (x, done, it), out
        return (x, done, it, search_state), out

    # python-unrolled GN loop (MAX_NUM_ITERS is 3): same trace as a
    # lax.scan but with no control-flow primitive in the program — XLA fuses
    # identically on a healthy runtime, and host-driven runtimes that
    # execute loop constructs slowly (see BENCH.md r03 caveat) aren't hit.
    # Only the LAST iteration's share struct is kept (for P⁺/diagnostics).
    carry = (x0, jnp.asarray(False), jnp.zeros((), jnp.int32))
    if mode != "rematch":
        carry = carry + (search_state,)
    out = None
    for _ in range(static_cfg.MAX_NUM_ITERS):
        carry, out = gn_iteration(carry, None)
    x, _, iters = carry[:3]
    valid, r, eigval_last, max_d_last, HtH, normals_last, centroids_last = out

    # final covariance from the last iteration's (already psum'd) HᵀH
    w = valid.astype(dtype)
    L = chart_transport(x, x0, dtype)
    with jax.enable_x64(use_f64):
        L_s = L.astype(solve_t)
        LtPinvL = L_s.T @ P_inv @ L_s
        S = (jnp.zeros((ERROR_DIM, ERROR_DIM), solve_t)
             .at[:12, :12].set(HtH.astype(solve_t) * r_inv) + LtPinvL)
        P_new = _inv_spd(S)
        P_new = 0.5 * (P_new + P_new.T)
    P_new = P_new.astype(dtype)

    n_matches = psum(jnp.sum(valid)).astype(jnp.int32)
    diag = UpdateDiagnostics(
        num_matches=n_matches,
        mean_residual=psum(jnp.sum(jnp.abs(r) * w)) / jnp.maximum(n_matches, 1),
        eigenvalues=eigval_last,
        delta_norm=max_d_last,
        iterations=iters,
        plane_normals=normals_last,
        plane_centroids=centroids_last,
        plane_valid=valid,
    )
    return x, P_new, diag
