"""Batched plane fitting and match validity gates.

TPU-native replacement for `R3Math::estimate_plane`/`is_plane`
(`/root/reference/src/Utils/Utils.cpp:32-66`) and the `Plane` gatekeepers
(`src/Objects/Plane.cpp:19-55`).  The reference runs one 5×3 QR solve per
query point inside the OpenMP match loop (hot loop #4); here every point's
fit is a closed-form 3×3 normal-equation solve, batched over the whole window
in one fused call.

Plane model: A·x + B·y + C·z + D = 0 with (A,B,C) unit.  Fitted by solving
`N·[a b c]ᵀ = -1` in least squares (same formulation as estimate_plane), then
normalizing: n = v/‖v‖, D = 1/‖v‖.
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp


class PlaneFit(NamedTuple):
    normal: jnp.ndarray     # (N, 3) unit normals
    d: jnp.ndarray          # (N,)  plane offset D
    valid: jnp.ndarray      # (N,)  all gates passed (`Match::is_chosen`)
    centroid: jnp.ndarray   # (N, 3) neighbor centroid (viz: /limovelo/planes;
                            #   the reference computes this with an
                            #   uninitialized accumulator, Utils.cpp:68-73 —
                            #   fixed here, viz-only impact)


def fit_planes(
    neighbors: jnp.ndarray,    # (N, k, 3)
    sq_dists: jnp.ndarray,     # (N, k) ascending
    nb_valid: jnp.ndarray,     # (N, k)
    max_dist_plane: float,
    planes_threshold: float,
) -> PlaneFit:
    """Fit a plane to each point's k neighbors and apply the reference gates:

    1. ≥ k neighbors found             (Plane::enough_points, Plane.cpp:36-38)
    2. farthest sq dist < MAX_DIST_PLANE²  (points_close_enough, :40-43)
    3. every |residual| < PLANES_THRESHOLD (R3Math::is_plane, Utils.cpp:59-66)
    """
    N, k, _ = neighbors.shape
    dtype = neighbors.dtype

    enough = jnp.all(nb_valid, axis=-1)
    worst = jnp.max(jnp.where(nb_valid, sq_dists, jnp.inf), axis=-1)
    close = worst < max_dist_plane * max_dist_plane

    # normal equations for A v = -1:  (AᵀA) v = -Aᵀ1
    pts = jnp.where(nb_valid[..., None], neighbors, 0.0)
    AtA = jnp.einsum("nki,nkj->nij", pts, pts)            # (N,3,3)
    At1 = -jnp.sum(pts, axis=1)                           # (N,3)
    # regularize to keep the solve finite for degenerate neighbor sets; such
    # fits are rejected by gate 3 anyway
    AtA = AtA + 1e-8 * jnp.eye(3, dtype=dtype)
    v = jnp.linalg.solve(AtA, At1[..., None])[..., 0]     # (N,3)

    norm = jnp.linalg.norm(v, axis=-1)
    norm_safe = jnp.where(norm > 1e-12, norm, 1.0)
    normal = v / norm_safe[..., None]
    d = 1.0 / norm_safe

    # residual gate over the actual neighbors
    res = jnp.einsum("nki,ni->nk", neighbors, normal) + d[..., None]
    flat = jnp.all(jnp.where(nb_valid, jnp.abs(res), 0.0) < planes_threshold, axis=-1)

    finite = jnp.all(jnp.isfinite(v), axis=-1) & jnp.isfinite(d)
    valid = enough & close & flat & (norm > 1e-12) & finite
    # zero out invalid rows: degenerate solves can return inf/NaN, and a
    # later `H * mask` would still propagate them (NaN·0 = NaN)
    normal = jnp.where(valid[..., None], normal, 0.0)
    d = jnp.where(valid, d, 0.0)

    cnt = jnp.sum(nb_valid, axis=-1).astype(dtype)        # (N,)
    centroid = -At1 / jnp.maximum(cnt, 1.0)[..., None]    # sum(pts)/count
    centroid = jnp.where(valid[..., None], centroid, 0.0)
    return PlaneFit(normal=normal, d=d, valid=valid, centroid=centroid)


def point_plane_distance(pts: jnp.ndarray, fit: PlaneFit) -> jnp.ndarray:
    """Signed distance of each (global-frame) point to its matched plane
    (`Plane::dist_to_plane`, Plane.cpp:27-29)."""
    return jnp.sum(pts * fit.normal, axis=-1) + fit.d
