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
   (27×64 points ≈ 20 KB) HBM→VMEM once, compute all GROUP_CAP×1728
   distances on the VPU, select the k best, write grouped results.
3. A final XLA gather un-permutes grouped results back to query order.

HBM traffic drops from N×27×64 to (#groups)×27×64 points — typically ~10×
less for automotive scans (many queries per occupied voxel).

STATUS (round 1): correctness-validated in interpret mode (exact match vs
`mapping.knn` with g_max=N).  The Mosaic compile path currently rejects the
(27,S)→(27·S,) flatten inside the kernel; the fix is a structure-of-arrays
map layout (pts as (T,3,S) so per-coordinate planes are (·,S) tiles) plus an
incremental per-bucket top-k merge — queued for the next round together with
spatial super-tiling (load a 6³ bucket tile once for all queries in its 4³
interior, amortizing neighborhoods ~8× independent of query clustering).
The XLA path remains the production KNN (full step already ~46× the
reference's headline rate).

Returns `mapping.knn` shapes/semantics: (neighbors (N,k,3), sq_dists (N,k)
ascending, valid (N,k)).
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...mapping.hashgrid import (
    GridParams,
    HashGridMap,
    _fine_coords,
    _lookup_buckets,
    _neighbor_offsets,
)

GROUP_CAP = 64        # queries per group (splitting large voxel groups)
NEIGHBORS = 27        # 3³ buckets


def group_queries(m: HashGridMap, queries: jnp.ndarray, params: GridParams, g_max: int):
    """Sort queries by coarse voxel, pack into ≤GROUP_CAP groups, resolve
    neighbor buckets per group.

    Returns:
      bucket_ids  (g_max, 27) int32  — neighbor buckets per group (-1 absent)
      group_of    (N,) int32         — group index per original query (-1 ⇒
                                        overflowed g_max: no result)
      rank_of     (N,) int32         — slot within group per original query
      order_q     (g_max, GROUP_CAP, 3) f32 — queries gathered per group slot
      slot_valid  (g_max, GROUP_CAP) bool
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
    offs = jnp.asarray(_neighbor_offsets(1))                    # (27,3)
    nb_coords = leader_coarse[:, None, :] + offs[None, :, :]
    bucket_ids = _lookup_buckets(m.keys, nb_coords, params)     # (g_max,27)
    bucket_ids = jnp.where(group_active[:, None], bucket_ids, -1)

    # scatter queries into group slots
    order_q = jnp.zeros((g_max, GROUP_CAP, 3), queries.dtype).at[
        gid_c, slot
    ].set(qs, mode="drop")
    slot_valid = jnp.zeros((g_max, GROUP_CAP), bool).at[gid_c, slot].set(
        in_range, mode="drop"
    )

    # per-original-query group/rank (inverse permutation of `order`)
    group_of = jnp.full((N,), -1, jnp.int32).at[order].set(
        jnp.where(in_range, gid, -1).astype(jnp.int32)
    )
    rank_of = jnp.zeros((N,), jnp.int32).at[order].set(slot.astype(jnp.int32))
    return bucket_ids, group_of, rank_of, order_q, slot_valid


def _knn_kernel(
    # scalar-prefetch
    bucket_ids_ref,   # (g_max, 27) SMEM
    # inputs (blocked per group)
    queries_ref,      # (1, GROUP_CAP, 3) VMEM
    pts_hbm,          # (T, S, 3) HBM (manual DMA)
    d2_hbm,           # (T, S) HBM
    # outputs
    nb_out,           # (1, GROUP_CAP, k, 3) VMEM
    sq_out,           # (1, GROUP_CAP, k) VMEM
    # scratch
    cand_pts,         # (27, S, 3) VMEM
    cand_occ,         # (27, S) VMEM
    sems,             # DMA semaphores (2,)
    *,
    k: int,
    slots: int,
):
    g = pl.program_id(0)

    # DMA the 27 neighbor buckets into VMEM (absent buckets → bucket 0, then
    # masked via occupancy AND the absent flag below)
    def fetch(i, _):
        bid = bucket_ids_ref[g, i]                         # scalar SMEM read
        safe = jnp.maximum(bid, 0)
        cp = pltpu.make_async_copy(pts_hbm.at[safe], cand_pts.at[i], sems.at[0])
        cp.start()
        cp.wait()
        cd = pltpu.make_async_copy(d2_hbm.at[safe], cand_occ.at[i], sems.at[1])
        cd.start()
        cd.wait()

        # absent bucket (bid < 0): poison its occupancy so every slot is
        # excluded (the SMEM ref only supports scalar reads, so the absent
        # mask is applied here, not vectorized later)
        @pl.when(bid < 0)
        def _():
            cand_occ[i] = jnp.full((slots,), jnp.inf, cand_occ.dtype)

        return 0

    jax.lax.fori_loop(0, NEIGHBORS, fetch, 0)

    q = queries_ref[0]                                     # (C,3)
    pts = cand_pts[...].reshape(NEIGHBORS * slots, 3)      # (V,3)
    occ_d2 = cand_occ[...].reshape(NEIGHBORS * slots)
    occupied = jnp.isfinite(occ_d2)

    # (C, V) squared distances
    d2 = (
        jnp.sum(q * q, axis=-1)[:, None]
        - 2.0 * jnp.dot(q, pts.T, preferred_element_type=jnp.float32)
        + jnp.sum(pts * pts, axis=-1)[None, :]
    )
    d2 = jnp.where(occupied[None, :], d2, jnp.inf)

    # k-pass min selection (k is tiny; avoids relying on top_k lowering)
    C = q.shape[0]
    row = jax.lax.broadcasted_iota(jnp.int32, d2.shape, 1)
    for j in range(k):
        best = jnp.min(d2, axis=-1)                        # (C,)
        arg = jnp.argmin(d2, axis=-1)                      # (C,)
        sq_out[0, :, j] = best
        sel = row == arg[:, None]
        nb_out[0, :, j, :] = jnp.sum(
            jnp.where(sel[..., None], pts[None, :, :], 0.0), axis=1
        )
        d2 = jnp.where(sel, jnp.inf, d2)


@partial(jax.jit, static_argnames=("params", "k", "g_max", "interpret"))
def knn_grouped(
    m: HashGridMap,
    queries: jnp.ndarray,
    params: GridParams,
    k: int = 5,
    g_max: int | None = None,
    interpret: bool = False,
):
    """Drop-in replacement for `mapping.knn` (1-ring) using the Pallas kernel."""
    N = queries.shape[0]
    if g_max is None:
        g_max = max(N // 4, 64)
    S = params.slots

    bucket_ids, group_of, rank_of, order_q, slot_valid = group_queries(
        m, queries, params, g_max
    )

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(g_max,),
        in_specs=[
            pl.BlockSpec((1, GROUP_CAP, 3), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),   # pts table stays in HBM
            pl.BlockSpec(memory_space=pltpu.ANY),   # cell_d2 table
        ],
        out_specs=[
            pl.BlockSpec((1, GROUP_CAP, k, 3), lambda g, b: (g, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, GROUP_CAP, k), lambda g, b: (g, 0, 0), memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((NEIGHBORS, S, 3), jnp.float32),
            pltpu.VMEM((NEIGHBORS, S), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )

    nb_g, sq_g = pl.pallas_call(
        partial(_knn_kernel, k=k, slots=S),
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((g_max, GROUP_CAP, k, 3), jnp.float32),
            jax.ShapeDtypeStruct((g_max, GROUP_CAP, k), jnp.float32),
        ],
        interpret=interpret,
    )(bucket_ids, order_q, m.pts, m.cell_d2)

    # un-permute to query order
    ok = group_of >= 0
    g_safe = jnp.where(ok, group_of, 0)
    nb = nb_g[g_safe, rank_of]                              # (N,k,3)
    sq = sq_g[g_safe, rank_of]                              # (N,k)
    sq = jnp.where(ok[:, None], sq, jnp.inf)
    valid = jnp.isfinite(sq)
    return nb, sq, valid
