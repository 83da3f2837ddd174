"""Batched plane fitting and match validity gates.

TPU-native replacement for `R3Math::estimate_plane`/`is_plane`
(`/root/reference/src/Utils/Utils.cpp:32-66`) and the `Plane` gatekeepers
(`src/Objects/Plane.cpp:19-55`).  The reference runs one 5×3 QR solve per
query point inside the OpenMP match loop (hot loop #4); here every point's
fit is a closed-form batched solve over the whole window in one fused call.

Plane model: unit normal n with the plane anchored at the neighbor centroid c;
signed distance of a point q is  n·(q − c).

Why not the reference's formulation: `estimate_plane` solves `P·v = −1` over
the RAW neighbor coordinates (Utils.cpp:32-57) — fine in its f64 CPU solve,
but catastrophically ill-conditioned in f32 once the map is far from the
origin.  With neighbors p = c + δ (centroid |c| ~ 160 m on a long corridor,
local spread ‖δ‖ ~ 0.5 m, planarity noise ~ 0.01 m), cond(PᵀP) ≈
|c|²/noise² ~ 1e9–1e10, far beyond f32's 1/eps ≈ 8.4e6 — the normals turn to
noise exactly when the trajectory gets long.  The fix is the standard
geometric fit in CENTERED coordinates: n = the smallest-eigenvalue direction
of the 3×3 neighbor scatter ΔᵀΔ (total least squares), whose conditioning is
independent of |c|.  For gate-passing (flat) neighbor sets the two normals
agree to O(noise²/spread²); the residual gate (PLANES_THRESHOLD) rejects
everything else in both formulations.

The eigenvector is computed with a closed-form analytic 3×3 symmetric
eigensolver (trigonometric characteristic-polynomial roots + cross-product
null-space extraction) — pure elementwise VPU work that XLA fuses, no LAPACK
loop, no per-point QR.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax.numpy as jnp


class PlaneFit(NamedTuple):
    normal: jnp.ndarray     # (N, 3) unit normals
    valid: jnp.ndarray      # (N,)  all gates passed (`Match::is_chosen`)
    centroid: jnp.ndarray   # (N, 3) neighbor centroid — the plane anchor
                            #   (also viz: /limovelo/planes; the reference
                            #   computes this with an uninitialized
                            #   accumulator, Utils.cpp:68-73 — fixed here)

    def offset_D(self) -> jnp.ndarray:
        """Classic D of (A,B,C,D) with n·q + D = dist — publishing only;
        reconstructing it reintroduces the large-coordinate product n·c, so
        the solver never uses it."""
        return -jnp.sum(self.normal * self.centroid, axis=-1)


def _smallest_eigvec_3x3(
    A: jnp.ndarray,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Eigenvector of the smallest eigenvalue of symmetric (..., 3, 3) A,
    an ok-flag (False where the null-space direction is numerically
    ambiguous — isotropic or rank-0 scatter; callers gate those out), and
    the (λ_min, λ_mid, λ_max) eigenvalues — λ_min/λ_mid is the planarity of
    the neighbor set (≈0 for a true plane, O(1) for corners/edges) and
    λ_mid/λ_max its 2D spread (≈0 for a scan-line stripe), used by the
    junction and collinearity gates in `fit_planes`.

    Analytic: trig solution of the characteristic cubic (Smith's algorithm),
    then the eigenvector as the largest cross product of rows of (A − λI).
    All elementwise — fuses into the surrounding match computation.
    """
    dtype = A.dtype
    # scale-normalize for stability
    scale = jnp.maximum(jnp.max(jnp.abs(A), axis=(-2, -1), keepdims=True), 1e-30)
    B = A / scale

    q = jnp.trace(B, axis1=-2, axis2=-1) / 3.0
    Bq = B - q[..., None, None] * jnp.eye(3, dtype=dtype)
    p2 = jnp.sum(Bq * Bq, axis=(-2, -1)) / 6.0
    p = jnp.sqrt(jnp.maximum(p2, 0.0))
    p_safe = jnp.where(p > 1e-20, p, 1.0)
    C = Bq / p_safe[..., None, None]
    # explicit 3×3 cofactor determinant: guaranteed elementwise VPU code
    # (jnp.linalg.det may lower to batched LU on some backends)
    c00, c01, c02 = C[..., 0, 0], C[..., 0, 1], C[..., 0, 2]
    c10, c11, c12 = C[..., 1, 0], C[..., 1, 1], C[..., 1, 2]
    c20, c21, c22 = C[..., 2, 0], C[..., 2, 1], C[..., 2, 2]
    detC = (c00 * (c11 * c22 - c12 * c21)
            - c01 * (c10 * c22 - c12 * c20)
            + c02 * (c10 * c21 - c11 * c20))
    r = jnp.clip(detC / 2.0, -1.0, 1.0)
    phi = jnp.arccos(r) / 3.0
    # eigenvalues: λ_max = q + 2p cos(φ); λ_min = q + 2p cos(φ + 2π/3);
    # λ_mid = trace − λ_max − λ_min
    lam_max = q + 2.0 * p * jnp.cos(phi)
    lam_min = q + 2.0 * p * jnp.cos(phi + 2.0 * jnp.pi / 3.0)
    lam_mid = 3.0 * q - lam_max - lam_min

    # null-space direction of (B − λ_min I): rows span the orthogonal plane
    M = B - lam_min[..., None, None] * jnp.eye(3, dtype=dtype)
    r0, r1, r2 = M[..., 0, :], M[..., 1, :], M[..., 2, :]
    c01 = jnp.cross(r0, r1)
    c12 = jnp.cross(r1, r2)
    c02 = jnp.cross(r0, r2)
    n01 = jnp.sum(c01 * c01, axis=-1)
    n12 = jnp.sum(c12 * c12, axis=-1)
    n02 = jnp.sum(c02 * c02, axis=-1)
    best = jnp.where(
        (n01 >= n12)[..., None] & (n01 >= n02)[..., None],
        c01,
        jnp.where((n12 >= n02)[..., None], c12, c02),
    )
    nbest = jnp.sqrt(jnp.maximum(jnp.maximum(n01, n12), n02))
    ok = (nbest > 1e-12) & (p > 1e-20)
    v = best / jnp.where(nbest > 1e-12, nbest, 1.0)[..., None]
    s = scale[..., 0, 0]
    return v, ok, lam_min * s, lam_mid * s, lam_max * s


def fit_planes(
    neighbors: jnp.ndarray,
    sq_dists: jnp.ndarray,
    nb_valid: jnp.ndarray,
    max_dist_plane,
    planes_threshold,
    planarity=0.12,
    linearity=0.04,
) -> PlaneFit:
    """Fit a plane to each point's k neighbors (shapes: neighbors (N,k,3),
    sq_dists (N,k) ascending, nb_valid (N,k)) and apply the gates:

    1. ≥ k neighbors found             (Plane::enough_points, Plane.cpp:36-38)
    2. farthest sq dist < MAX_DIST_PLANE²  (points_close_enough, :40-43)
    3. every |residual| < PLANES_THRESHOLD (R3Math::is_plane, Utils.cpp:59-66)
    4. λ_min ≤ planarity·λ_mid of the neighbor scatter — beyond-reference
       junction gate, free from the TLS eigensolve.  Neighbor sets straddling
       two surfaces (wall/floor corners, pillar edges) can pass gate 3's
       absolute threshold yet fit a tilted pseudo-plane whose residual sign
       tracks the motion direction — measured as a +4 mm/window systematic
       pull on the 20 m/s straight.  True planar sets have λ_min/λ_mid ≈
       (noise/spread)² ≪ 0.1; corner sets are O(1).
    5. λ_mid ≥ linearity·λ_max — beyond-reference collinearity gate.  A
       spinning LiDAR paints walls in horizontal beam stripes; before the
       map fills in, a 5-NN set often lies on ONE stripe (λ_min ≈ λ_mid ≈ 0):
       the fitted plane is free to rotate about the stripe, so its normal —
       and the residual it induces — is arbitrary.  Well-spread 2D sets have
       λ_mid/λ_max ≈ 0.1–1; stripe sets ≈ (transverse/along)² ≲ 0.01.
    """
    dtype = neighbors.dtype

    enough = jnp.all(nb_valid, axis=-1)
    worst = jnp.max(jnp.where(nb_valid, sq_dists, jnp.inf), axis=-1)
    close = worst < max_dist_plane * max_dist_plane

    # centered scatter — conditioning independent of distance from origin
    w_mask = nb_valid[..., None].astype(dtype)
    cnt = jnp.sum(nb_valid, axis=-1).astype(dtype)            # (N,)
    cnt_safe = jnp.maximum(cnt, 1.0)
    centroid = jnp.sum(neighbors * w_mask, axis=1) / cnt_safe[..., None]
    delta = jnp.where(nb_valid[..., None], neighbors - centroid[:, None, :], 0.0)
    AtA = jnp.einsum("nki,nkj->nij", delta, delta)            # (N,3,3)

    normal, ok, lam_min, lam_mid, lam_max_out = _smallest_eigvec_3x3(AtA)

    # deterministic sign: +z hemisphere (ties → +y, then +x).  Sign is
    # irrelevant to the update (r and H flip together); determinism keeps
    # runs bit-reproducible.
    s = jnp.where(
        jnp.abs(normal[..., 2]) > 1e-6,
        jnp.sign(normal[..., 2]),
        jnp.where(
            jnp.abs(normal[..., 1]) > 1e-6,
            jnp.sign(normal[..., 1]),
            jnp.where(normal[..., 0] >= 0, 1.0, -1.0),
        ),
    )
    normal = normal * s[..., None]

    # residual gate over the actual neighbors, in centered coordinates
    res = jnp.einsum("nki,ni->nk", delta, normal)
    flat = jnp.all(
        jnp.where(nb_valid, jnp.abs(res), 0.0) < planes_threshold, axis=-1
    )

    planar = lam_min <= planarity * jnp.maximum(lam_mid, 1e-12)
    spread2d = lam_mid >= linearity * lam_max_out
    finite = jnp.all(jnp.isfinite(normal), axis=-1)
    valid = enough & close & flat & finite & ok & planar & spread2d
    # zero out invalid rows: degenerate solves can produce junk directions,
    # and a later `H * mask` would still propagate NaNs (NaN·0 = NaN)
    normal = jnp.where(valid[..., None], normal, 0.0)
    centroid = jnp.where(valid[..., None], centroid, 0.0)
    return PlaneFit(normal=normal, valid=valid, centroid=centroid)


def point_plane_distance(pts: jnp.ndarray, fit: PlaneFit) -> jnp.ndarray:
    """Signed distance of each (global-frame) point to its matched plane
    (`Plane::dist_to_plane`, Plane.cpp:27-29) — computed against the fit
    centroid so no large-coordinate cancellation occurs."""
    return jnp.sum((pts - fit.centroid) * fit.normal, axis=-1)
