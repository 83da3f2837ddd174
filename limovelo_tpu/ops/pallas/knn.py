"""Pallas TPU kernel for hash-grid KNN — the system's hot loop.

The XLA path (`mapping.knn`) materializes a dense (N, 27, 64, 3) candidate
gather per query batch: ~57 MB of HBM traffic per 2048-query match, ×4
match passes per LIO step — which measures as essentially the entire step
latency.  But queries are spatially clustered: all queries in the same
coarse voxel share the identical 27-bucket neighborhood.

This kernel exploits that:

1. An XLA pre-pass (`group_queries`) sorts queries by coarse voxel and packs
   them into groups of ≤ GROUP_CAP queries sharing one bucket neighborhood,
   then resolves each group's 27 neighbor buckets with one probe sweep (per
   group, not per query — a 27× reduction in probe work too).
2. The kernel runs one grid step per group: DMA the group's 27 buckets
   (27×64 points ≈ 20 KB) HBM→VMEM once into a flat (27·S, 3) candidate
   buffer, compute all GROUP_CAP×1728 distances with ONE MXU matmul (the
   homogeneous-coordinate trick below), and select the k best per query.
3. A final XLA pass gathers neighbor coordinates from the winning
   (bucket, slot) indices and un-permutes back to query order.

Mosaic-friendliness (why this shape of kernel compiles where the obvious one
does not):
- No in-kernel reshapes/transposes: candidates land flat via 27 sliced DMAs.
- Distances via `‖q−p‖² = ‖q‖² + [q,1]·[−2p,‖p‖²]ᵀ` — one (C,4)×(4,V)
  `dot_general` on the MXU; no (V,) row-vector broadcasts that would need a
  sublane→lane move.
- No occupancy mask: empty slots hold the FAR sentinel (mapping.hashgrid.FAR)
  so their distances are ~1e18 and they lose every contest; absent buckets
  are filled with FAR in VMEM instead of being DMA'd.
- Outputs are (sq_dist, flat candidate index) — coordinate gathering happens
  in XLA afterwards, keeping the kernel's stores lane-aligned.

Returns `mapping.knn` shapes/semantics: (neighbors (N,k,3), sq_dists (N,k)
ascending, valid (N,k)).  Replaces the reference's per-point
`KD_TREE::Nearest_Search` (`/root/reference/src/Modules/Mapper.cpp:82-89`).

STATUS (measured on TPU v5e):
- round 1: Mosaic-compiles; matches the XLA oracle (d2 within 5e-7).  LOSES
  on voxel-downsampled windows (~1.1 queries/coarse voxel → 98% padding:
  6.3 ms vs 3.6 ms standalone at equal shapes).
- round 3 (bench_pallas.py, the kernel's stated winning regime — raw
  non-downsampled full-rotation clouds, 10 queries/coarse voxel, 8192
  queries): **0.066 ms vs 0.083 ms XLA — 1.26× faster, 100% d2 agreement**.
  Adopted as the selectable `config.knn_backend="pallas"` match backend for
  rings=1 configurations with dense windows (filter/update._match); the
  production racing/KITTI configs keep XLA because their derived rings=3
  coverage exceeds this kernel's 1-ring envelope and their windows are
  voxel-downsampled.
- round 5 (bench_pallas.py, PRODUCTION envelope — 2048 voxel-downsampled
  queries at 2.4 queries/coarse voxel, rings=3, max_buckets=32 group-level
  tier): **XLA WINS 0.90×** (20.8 ms vs 18.6 ms amortized, 100% d2
  agreement on overlap); the rings=1 dense regime also flipped to
  **XLA 0.72×** on this session's chip.  SETTLED VERDICT (VERDICT r4 #6):
  at production sparsity the per-group bucket sharing collapses (2.4
  queries/voxel → most groups DMA 32 buckets for a handful of queries), so
  the grouped-DMA family cannot realize the calibration-probe bandwidth —
  the probe streams a dense contiguous index set while the match gather is
  latency-bound on small scattered blocks.  The fused match kernel (KNN +
  plane fit + H rows in VMEM) is NOT built on this evidence: its premise
  was that the gather's 193 GB/s had 3.8× headroom, but the headroom is an
  artifact of comparing against a dense-pattern probe, and the sub-ms step
  already meets the 100 Hz target with 40× margin.
Capacity note: scalar-prefetch SMEM bounds g_max ≲ 1500 (27 int32/group,
1 MB SMEM); overflowed queries return valid=False, never garbage.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...mapping.hashgrid import (
    FAR,
    GridParams,
    HashGridMap,
    _fine_coords,
    _lookup_buckets,
    _neighbor_offsets,
)

GROUP_CAP = 64        # queries per group (splitting large voxel groups)
NEIGHBORS = 27        # 3³ buckets (the 1-ring envelope; see `group_queries`)
VALID_D2_MAX = 1.0e16  # any true candidate is closer; sentinel slots are ~1e18


def group_queries(m: HashGridMap, queries: jnp.ndarray, params: GridParams,
                  g_max: int, rings: int = 1, max_buckets: int | None = None):
    """Sort queries by coarse voxel, pack into ≤GROUP_CAP groups, resolve
    neighbor buckets per group.

    `rings`/`max_buckets` extend the envelope to the PRODUCTION setting
    (derived rings covering MAX_DIST_PLANE + tiered bucket budget,
    mapping.knn's exact-on-sparse-maps argument): the (2r+1)³ neighborhood is
    reduced to the `max_buckets` nearest OCCUPIED buckets by AABB
    lower-bound distance from the GROUP's leader-voxel center (the XLA path
    tiers per query; co-voxel queries differ from the leader center by at
    most half a coarse voxel, and on the sparse maps where wide rings matter
    the occupied-bucket count is below the budget anyway — recall vs the
    exact oracle is regression-tested in tests/test_pallas_knn.py).

    Returns:
      bucket_ids  (g_max, NB) int32  — neighbor buckets per group (-1 absent)
      group_of    (N,) int32         — group index per original query (-1 ⇒
                                        overflowed g_max: no result)
      rank_of     (N,) int32         — slot within group per original query
      order_q     (g_max, GROUP_CAP, 3) f32 — queries gathered per group slot
    """
    N = queries.shape[0]
    fine = _fine_coords(queries, params.voxel_size)
    coarse = jnp.floor_divide(fine, params.coarse_factor)      # (N,3)

    order = jnp.lexsort((coarse[:, 2], coarse[:, 1], coarse[:, 0]))
    cs = coarse[order]
    qs = queries[order]

    is_first = jnp.concatenate(
        [jnp.array([True]), jnp.any(cs[1:] != cs[:-1], axis=-1)]
    )
    idx = jnp.arange(N)
    starts = jax.lax.associative_scan(jnp.maximum, jnp.where(is_first, idx, -1))
    rank = idx - starts
    new_group = is_first | (rank % GROUP_CAP == 0)
    gid = jnp.cumsum(new_group) - 1                             # (N,) sorted order
    slot = rank % GROUP_CAP

    in_range = gid < g_max
    gid_c = jnp.where(in_range, gid, g_max)                     # OOB rows dropped

    # group leader coarse coords → neighbor buckets
    leader_coarse = jnp.zeros((g_max, 3), jnp.int32).at[
        jnp.where(new_group & in_range, gid_c, g_max)
    ].set(cs, mode="drop")
    group_active = jnp.zeros((g_max,), bool).at[
        jnp.where(new_group & in_range, gid_c, g_max)
    ].set(True, mode="drop")
    offs = jnp.asarray(_neighbor_offsets(rings))                # (V,3)
    nb_coords = leader_coarse[:, None, :] + offs[None, :, :]
    bucket_ids = _lookup_buckets(m.keys, nb_coords, params)     # (g_max,V)
    bucket_ids = jnp.where(group_active[:, None], bucket_ids, -1)

    if max_buckets is not None and max_buckets < bucket_ids.shape[1]:
        # group-level tier: keep the budgeted nearest occupied buckets by
        # AABB lower-bound distance from the leader-voxel center
        cs = params.coarse_size
        lo = nb_coords.astype(queries.dtype) * cs               # (g_max,V,3)
        ctr = (leader_coarse.astype(queries.dtype) + 0.5) * cs  # (g_max,3)
        clamped = jnp.clip(ctr[:, None, :], lo, lo + cs)
        d_lb = jnp.sum((clamped - ctr[:, None, :]) ** 2, axis=-1)
        d_lb = jnp.where(bucket_ids >= 0, d_lb, jnp.inf)
        _, sel = jax.lax.top_k(-d_lb, max_buckets)              # (g_max,NB)
        bucket_ids = jnp.take_along_axis(bucket_ids, sel, axis=1)

    # scatter queries into group slots (vacant slots hold FAR so their
    # nearest candidate is never "valid" — they're padding, results unused)
    order_q = jnp.full((g_max, GROUP_CAP, 3), FAR, queries.dtype).at[
        gid_c, slot
    ].set(qs, mode="drop")

    # per-group recenter offset: the kernel expands ‖q−p‖² as
    # ‖q‖²−2q·p+‖p‖², which cancels catastrophically in f32 when the robot
    # is O(100 m) from the world origin; shifting both q and p by the group
    # leader's bucket center keeps coordinates O(coarse_size) and the
    # expansion exact to ~1e-6
    centers = (leader_coarse.astype(queries.dtype) + 0.5) * (
        params.voxel_size * params.coarse_factor
    )
    centers = centers[:, None, :]                               # (g_max,1,3)

    # per-original-query group/rank (inverse permutation of `order`)
    group_of = jnp.full((N,), -1, jnp.int32).at[order].set(
        jnp.where(in_range, gid, -1).astype(jnp.int32)
    )
    rank_of = jnp.zeros((N,), jnp.int32).at[order].set(slot.astype(jnp.int32))
    return bucket_ids, group_of, rank_of, order_q, centers


def _knn_kernel(*refs, k: int, slots: int, nb: int):
    (bucket_ids_ref,   # (g_max, nb) SMEM (scalar prefetch)
     queries_ref,      # (1, GROUP_CAP, 3) VMEM (blocked per group)
     centers_ref) = refs[:3]  # (1, 1, 3) VMEM — per-group recenter offset
    bucket_refs = refs[3:3 + nb]  # nb× (1, S, 3) VMEM — the group's
                                  # neighbor buckets, DMA'd by the
                                  # pipeline via scalar-prefetched
                                  # index maps (no manual DMA: a
                                  # (...,3) array cannot be memref-
                                  # sliced under the 128-lane tiling)
    sq_out, idx_out = refs[3 + nb:]  # (1, GROUP_CAP, k); idx flat nb*S+slot

    g = pl.program_id(0)
    center = centers_ref[0]                                # (1,3)
    q = queries_ref[0] - center                            # (C,3) recentered

    # absent buckets were clamped to row 0 by the index map; poison their
    # candidates with the FAR sentinel so they lose every distance contest
    cands = []
    for i in range(nb):
        bid = bucket_ids_ref[g, i]
        cands.append(jnp.where(bid >= 0, bucket_refs[i][0], FAR))
    pts = jnp.concatenate(cands, axis=0) - center          # (V,3), V = nb*S

    # ‖q−p‖² = ‖q‖² + [q,1]·[−2p,‖p‖²]ᵀ  — one MXU matmul, no transposes
    C = q.shape[0]
    q_h = jnp.concatenate([q, jnp.ones((C, 1), q.dtype)], axis=1)          # (C,4)
    p_h = jnp.concatenate(
        [-2.0 * pts, jnp.sum(pts * pts, axis=-1, keepdims=True)], axis=1
    )                                                                       # (V,4)
    d2 = jax.lax.dot_general(
        q_h, p_h, (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32
    ) + jnp.sum(q * q, axis=-1, keepdims=True)                              # (C,V)

    # k-pass min selection (k is tiny; avoids relying on top_k lowering)
    col = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    big = jnp.float32(3.4e38)
    for j in range(k):
        best = jnp.min(d2, axis=-1)                        # (C,)
        arg = jnp.argmin(d2, axis=-1)                      # (C,)
        sq_out[0, :, j] = best
        idx_out[0, :, j] = arg.astype(jnp.int32)
        d2 = jnp.where(col == arg[:, None], big, d2)


@partial(jax.jit, static_argnames=("params", "k", "g_max", "rings",
                                   "max_buckets", "interpret"))
def knn_grouped(
    m: HashGridMap,
    queries: jnp.ndarray,
    params: GridParams,
    k: int = 5,
    g_max: int | None = None,
    rings: int = 1,
    max_buckets: int | None = None,
    interpret: bool = False,
):
    """Drop-in replacement for `mapping.knn` using the Pallas grouped-DMA
    kernel — 1-ring by default; `rings`/`max_buckets` select the production
    tiered envelope (group-level tier, see `group_queries`)."""
    N = queries.shape[0]
    if g_max is None:
        g_max = max(N // 4, 64)
    S = params.slots

    bucket_ids, group_of, rank_of, order_q, centers = group_queries(
        m, queries, params, g_max, rings=rings, max_buckets=max_buckets
    )
    NB = int(bucket_ids.shape[1])

    def bucket_spec(j):
        # block row chosen by the scalar-prefetched bucket id (clamped; the
        # kernel poisons absent buckets)
        return pl.BlockSpec(
            (1, S, 3),
            lambda g, b, j=j: (jnp.maximum(b[g, j], 0), 0, 0),
            memory_space=pltpu.VMEM,
        )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_max,),
        in_specs=[
            pl.BlockSpec((1, GROUP_CAP, 3), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, 3), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM),
        ] + [bucket_spec(j) for j in range(NB)],
        out_specs=[
            pl.BlockSpec((1, GROUP_CAP, k), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP_CAP, k), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
    )

    sq_g, idx_g = pl.pallas_call(
        partial(_knn_kernel, k=k, slots=S, nb=NB),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g_max, GROUP_CAP, k), jnp.float32),
            jax.ShapeDtypeStruct((g_max, GROUP_CAP, k), jnp.int32),
        ],
        interpret=interpret,
    )(bucket_ids, order_q, centers, *([m.pts] * NB))

    # gather winning coordinates + un-permute to query order (XLA post-pass)
    ok = group_of >= 0
    g_safe = jnp.where(ok, group_of, 0)
    sq = sq_g[g_safe, rank_of]                              # (N,k)
    fidx = idx_g[g_safe, rank_of]                           # (N,k) flat nb*S+slot
    valid = ok[:, None] & (sq < VALID_D2_MAX)
    bid = bucket_ids[g_safe[:, None], fidx // S]            # (N,k)
    nb = m.pts[jnp.where(bid >= 0, bid, 0), fidx % S]       # (N,k,3)
    sq = jnp.where(valid, sq, jnp.inf)
    return nb, sq, valid
