"""Fixed-shape voxel-grid downsample.

TPU-native replacement for the PCL `VoxelGrid` used in
`Compensator::voxelgrid_downsample` (`/root/reference/src/Modules/
Compensator.cpp:148-163`): one output point per `leaf`-sized voxel.

Representative choice — deliberate deviation from PCL: PCL (and the
reference) output the voxel CENTROID, but a centroid of points straddling a
surface junction (wall/floor corner, pillar edge) lies OFF every surface —
up to leaf/2 into free space.  Those phantom queries feed systematically
signed point-to-plane residuals whose sign tracks the motion direction
(measured: ≈60 mm mean off-surface on pillar faces at 0.4 m leaf, biasing
the 20 m/s straight by ~4 mm/window).  We instead output the ACTUAL INPUT
POINT nearest the voxel centroid (the medoid w.r.t. the centroid): identical
density control, but every query stays on a measured surface.

Everything is fixed shape: the output has the same padded length as the
input, with a validity mask and the real count.  Compaction (moving valid
points to the front) is a sort by (invalid, voxel-order) — cheap and fully
jittable, so the downstream matcher sees a dense prefix.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class Downsampled(NamedTuple):
    pts: jnp.ndarray    # (N, 3) — valid prefix, zeros after
    mask: jnp.ndarray   # (N,)
    count: jnp.ndarray  # ()
    idx: jnp.ndarray    # (N,) int32 — ORIGINAL input index of each output
                        #   row (valid prefix; 0 after) so per-point side
                        #   channels (intensity) can be gathered on host


def voxel_downsample(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float) -> Downsampled:
    """One representative per voxel: the input point nearest the voxel's
    centroid (see module docstring for why not the centroid itself)."""
    N = pts.shape[0]
    dtype = pts.dtype
    fine = jnp.floor(pts / leaf).astype(jnp.int32)
    big = jnp.iinfo(jnp.int32).max
    fx = jnp.where(mask, fine[:, 0], big)
    fy = jnp.where(mask, fine[:, 1], big)
    fz = jnp.where(mask, fine[:, 2], big)

    order = jnp.lexsort((fz, fy, fx))
    fs = jnp.stack([fx, fy, fz], axis=-1)[order]
    ps = pts[order]
    ms = mask[order]

    is_first = jnp.concatenate([jnp.array([True]), jnp.any(fs[1:] != fs[:-1], axis=-1)])
    is_first = is_first & ms
    # segment id per sorted point (same voxel → same id)
    seg = jnp.cumsum(is_first) - 1                       # (N,) int
    seg = jnp.where(ms, seg, N - 1)                      # dump padding in last seg

    sums = jax.ops.segment_sum(
        jnp.where(ms[:, None], ps, 0.0), seg, num_segments=N
    )
    cnts = jax.ops.segment_sum(ms.astype(dtype), seg, num_segments=N)
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]

    # medoid selection: the actual point nearest its voxel centroid
    d2 = jnp.sum((ps - centroids[seg]) ** 2, axis=-1)
    d2 = jnp.where(ms, d2, jnp.inf)
    best_d2 = jax.ops.segment_min(d2, seg, num_segments=N)
    pos = jnp.arange(N)
    # deterministic tie-break: lowest sorted index among the minima
    pos_key = jnp.where(ms & (d2 <= best_d2[seg]), pos, N)
    best_pos = jnp.clip(
        jax.ops.segment_min(pos_key, seg, num_segments=N), 0, N - 1
    )
    reps = ps[best_pos]
    orig_idx = order[best_pos].astype(jnp.int32)   # back to input order

    n_vox = jnp.sum(is_first)
    out_mask = jnp.arange(N) < n_vox
    return Downsampled(
        pts=jnp.where(out_mask[:, None], reps, 0.0),
        mask=out_mask,
        count=n_vox.astype(jnp.int32),
        idx=jnp.where(out_mask, orig_idx, 0),
    )


# Range bands of `Compensator::onion_downsample` (Compensator.cpp:165-181):
# (low, high, base decimation divisor).  Points beyond the last band are
# always kept; the divisor is divided by config.downsample_rate.
_ONION_BANDS = (
    (0.0, 4.0, 256),
    (4.0, 6.0, 64),
    (6.0, 9.0, 32),
    (9.0, 12.0, 16),
    (12.0, 22.0, 8),
    (22.0, 30.0, 4),
    (30.0, 50.0, 2),
)


def onion_downsample(
    pts: jnp.ndarray, mask: jnp.ndarray, downsample_rate: int
) -> Downsampled:
    """Range-banded decimation — `Compensator::onion_downsample`
    (Compensator.cpp:165-181; disabled in the reference pipeline at
    Compensator.cpp:105-107 in favor of the voxel grid, but part of its API
    surface and useful for very dense close-range scans).

    Near points are decimated hard (every 256/rate-th), far points kept:
    band divisors 256/64/32/16/8/4/2 over ranges 0-4/4-6/6-9/9-12/12-22/
    22-30/30-50 m, everything >50 m kept.  `i % (divisor/rate)` uses the
    point's index within the (time-sorted) window, as the reference does.

    Output keeps input order compacted to a dense prefix (same contract as
    `voxel_downsample`).
    """
    N = pts.shape[0]
    r = jnp.linalg.norm(pts, axis=-1)
    idx = jnp.arange(N, dtype=jnp.int32)

    keep = r > _ONION_BANDS[-1][1]              # beyond last band: always keep
    for lo, hi, div in _ONION_BANDS:
        step = div // max(int(downsample_rate), 1)
        in_band = (lo < r) & (r < hi)
        band_keep = in_band if step <= 1 else in_band & (idx % step == 0)
        keep = keep | band_keep
    keep = keep & mask

    # compact to a dense prefix, preserving order
    order = jnp.argsort(~keep, stable=True)
    ps = pts[order]
    km = keep[order]
    n = jnp.sum(keep).astype(jnp.int32)
    return Downsampled(
        pts=jnp.where(km[:, None], ps, 0.0),
        mask=km,
        count=n,
        idx=jnp.where(km, order.astype(jnp.int32), 0),
    )
