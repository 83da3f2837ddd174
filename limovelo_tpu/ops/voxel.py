"""Fixed-shape voxel-grid downsample.

TPU-native replacement for the PCL `VoxelGrid` used in
`Compensator::voxelgrid_downsample` (`/root/reference/src/Modules/
Compensator.cpp:148-163`): one output point per `leaf`-sized voxel, at the
centroid of the voxel's points (PCL semantics).

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


def voxel_downsample(pts: jnp.ndarray, mask: jnp.ndarray, leaf: float) -> Downsampled:
    """Centroid-per-voxel downsample of a masked (N,3) batch."""
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

    n_vox = jnp.sum(is_first)
    out_mask = jnp.arange(N) < n_vox
    centroids = sums / jnp.maximum(cnts, 1.0)[:, None]
    return Downsampled(
        pts=jnp.where(out_mask[:, None], centroids, 0.0),
        mask=out_mask,
        count=n_vox.astype(jnp.int32),
    )
