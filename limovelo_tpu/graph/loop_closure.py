"""Loop-closure detection and scan registration.

Beyond-reference subsystem: candidate detection by trajectory proximity
(revisits), verified and measured by a point-to-plane registration of the
query keyframe's scan against a hash-grid map built from the candidate's
neighborhood — reusing the exact same batched KNN + plane-fit + Gauss-Newton
machinery as the odometry update (mapping/, ops/planes.py), just over a
6-DoF pose instead of the 23-dim filter state.
"""

from __future__ import annotations

from functools import partial
from typing import List, Optional, Tuple

import numpy as np

import jax
import jax.numpy as jnp

from ..geometry import so3
from ..mapping import GridParams, insert, knn, make_map
from ..ops.planes import fit_planes, point_plane_distance


def detect_loop_candidates(
    positions: np.ndarray,       # (K,3) keyframe positions
    min_index_gap: int = 20,
    max_distance: float = 5.0,
) -> List[Tuple[int, int]]:
    """Pairs (i, j<i−gap) of keyframes that revisit the same place."""
    out = []
    for i in range(len(positions)):
        js = np.where(
            np.linalg.norm(positions[: max(i - min_index_gap, 0)] - positions[i], axis=-1)
            < max_distance
        )[0]
        if len(js):
            j = int(js[np.argmin(np.linalg.norm(positions[js] - positions[i], axis=-1))])
            out.append((i, j))
    return out


@partial(jax.jit, static_argnames=("grid", "iters", "k"))
def _register(
    m,                    # hash map of the target neighborhood (target frame)
    scan: jnp.ndarray,    # (N,3) source scan (source LiDAR frame)
    mask: jnp.ndarray,
    R0: jnp.ndarray,      # initial source→target guess
    p0: jnp.ndarray,
    grid: GridParams,
    iters: int = 8,
    k: int = 5,
):
    """Point-to-plane ICP via Gauss-Newton over SE(3) (batched, on device)."""

    def gn(carry, _):
        R, p = carry
        g = jnp.einsum("ij,nj->ni", R, scan) + p
        nb, sq, nbv = knn(m, g, grid, k=k)
        fit = fit_planes(nb, sq, nbv, 2.0, 0.2)
        r = point_plane_distance(g, fit)
        w = (fit.valid & mask).astype(scan.dtype)
        # H rows over [δp(3), δθ(3)], right perturbation R ← R·Exp(δθ):
        #   ∂r/∂δp = nᵀ ;  ∂r/∂δθ = (s × (Rᵀn))ᵀ   (same shape as the
        #   reference's rotation column, Localizator.cpp:47-50)
        Rt_n = jnp.einsum("ji,nj->ni", R, fit.normal)
        Jrot = jnp.cross(scan, Rt_n)
        H = jnp.concatenate([fit.normal, Jrot], axis=-1)      # (N,6)
        Hw = H * w[:, None]
        A = Hw.T @ H + 1e-6 * jnp.eye(6, dtype=scan.dtype)
        b = Hw.T @ (r * w)
        delta = -jnp.linalg.solve(A, b)
        p_new = p + delta[:3]
        R_new = R @ so3.exp(delta[3:])
        n_match = jnp.sum(w)
        rms = jnp.sqrt(jnp.sum(r * r * w) / jnp.maximum(n_match, 1.0))
        return (R_new, p_new), (rms, n_match)

    (R, p), (rms_hist, n_hist) = jax.lax.scan(gn, (R0, p0), None, length=iters)
    return R, p, rms_hist[-1], n_hist[-1]


def register_scan_to_map(
    scan: np.ndarray,            # (N,3) source scan, LiDAR frame
    target_pts: np.ndarray,      # (M,3) target map points, target frame
    R0: np.ndarray,
    p0: np.ndarray,
    grid: Optional[GridParams] = None,
    iters: int = 8,
    max_points: int = 4096,
):
    """Register scan → target points; returns (R, p, rms, n_matches).

    Used by loop closure (a keyframe's scan vs an old keyframe's local map)
    and by HD-map relocalization bootstrapping.
    """
    grid = grid or GridParams(table_size=1 << 13, coarse_factor=4, voxel_size=0.2)
    m = make_map(grid)
    tp = np.asarray(target_pts, np.float32)
    for i in range(0, len(tp), 16384):
        c = tp[i : i + 16384]
        pad = np.zeros((16384, 3), np.float32)
        pad[: len(c)] = c
        msk = np.zeros(16384, bool)
        msk[: len(c)] = True
        m = insert(m, jnp.asarray(pad), jnp.asarray(msk), grid)

    s = np.asarray(scan, np.float32)
    if len(s) > max_points:
        s = s[np.random.default_rng(0).choice(len(s), max_points, replace=False)]
    pad = np.zeros((max_points, 3), np.float32)
    pad[: len(s)] = s
    msk = np.zeros(max_points, bool)
    msk[: len(s)] = True

    R, p, rms, n = _register(
        m, jnp.asarray(pad), jnp.asarray(msk),
        jnp.asarray(R0, jnp.float32), jnp.asarray(p0, jnp.float32),
        grid, iters=iters,
    )
    return np.asarray(R), np.asarray(p), float(rms), int(n)
