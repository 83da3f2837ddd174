"""Map-block sharding: the hash-grid map partitioned across a device mesh.

The replicated-map path (parallel/sharding.py) scales *compute* (point-batch
sharding with psum'd normal equations) but every device holds the full map —
map capacity is bounded by one HBM.  This module shards the map itself, the
long-context axis of a SLAM system (SURVEY.md §5 long-context row: the
reference's ikd-Tree grows without bound in one address space,
`/root/reference/src/Modules/Mapper.cpp:73-76` has no eviction): with D
devices the map holds D× the buckets.

Design (hash ownership + ring query):

- **Ownership**: a coarse bucket key `c` is owned by device
  `owner(c) = hash2(c) mod D`, with `hash2` drawn from different primes than
  the in-table probe hash so table position and owner are independent.  Each
  device stores only its owned buckets in a local `HashGridMap` of
  `table_size / D` rows — the lookup/insert/prune kernels are reused
  unchanged on the local shard.
- **Insert**: the (already voxel-downsampled, small) insert batch is
  `all_gather`ed, and each device scatters only the rows it owns.  Every key
  is inserted on exactly one device — race-free by partition, and replicas
  never diverge because there are none.
- **KNN**: query blocks circulate the ring.  Each hop, a device matches the
  visiting block against its local shard and folds the results into the
  block's running top-k (carried alongside the queries); `ppermute` moves the
  block to the next device.  After D hops every block has seen every shard
  and is back home — the union of the per-shard candidate sets is exactly
  the single-map candidate set, so the result is identical to an unsharded
  query (tested).  Communication per hop is the tiny
  (N/D)·(3 + 4k) floats riding ICI, overlapping the next hop's compute.

Cost model (honest): per-device KNN compute is D hops × (N/D) queries = N
query-evaluations, i.e. the same arithmetic as one device querying the whole
window against a replicated map.  Map sharding buys *capacity* (D× buckets)
and insert/prune bandwidth, not matcher FLOPs — point sharding (the other
axis, composable here) buys the FLOPs.
"""

from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P

from ..deskew.compensate import build_path, compensate
from ..filter.process import predict_window
from ..filter.update import iterated_update
from ..mapping import GridParams, HashGridMap, insert, knn, make_map
from ..mapping.hashgrid import _fine_coords
from ..ops.voxel import voxel_downsample
from ..step import StepInputs, StepOutputs, _derive_anchor_controls, make_telemetry

AXIS = "points"

# distinct from hashgrid._PRIMES so owner and table slot are uncorrelated
_OWNER_PRIMES = np.array([2654435761, 805459861, 3674653429], np.uint32)


def local_grid(grid: GridParams, n_devices: int) -> GridParams:
    """Per-device table geometry: table rows split D ways."""
    assert grid.table_size % n_devices == 0, "table_size must divide by mesh size"
    return grid._replace(table_size=grid.table_size // n_devices)


def owner_of(coarse: jnp.ndarray, n_devices: int) -> jnp.ndarray:
    """Device owning a coarse bucket coord (..., 3) → int32 in [0, D)."""
    c = coarse.astype(jnp.uint32)
    h = (
        (c[..., 0] * _OWNER_PRIMES[0])
        ^ (c[..., 1] * _OWNER_PRIMES[1])
        ^ (c[..., 2] * _OWNER_PRIMES[2])
    )
    return (h % jnp.uint32(n_devices)).astype(jnp.int32)


def _coarse_of_pts(pts: jnp.ndarray, grid: GridParams) -> jnp.ndarray:
    fine = _fine_coords(pts, grid.voxel_size)
    return jnp.floor_divide(fine, grid.coarse_factor)


def insert_sharded(
    m_local: HashGridMap,
    pts: jnp.ndarray,
    mask: jnp.ndarray,
    lgrid: GridParams,
    axis_name: str = AXIS,
    downsample: bool = True,
) -> HashGridMap:
    """Insert a point-sharded batch into the sharded map (inside shard_map).

    `pts`/`mask` are this device's shard of the batch; the batch is gathered
    so each device can take the rows whose bucket it owns.
    """
    D = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    pts_all = jax.lax.all_gather(pts, axis_name, tiled=True)
    mask_all = jax.lax.all_gather(mask, axis_name, tiled=True)
    mine = owner_of(_coarse_of_pts(pts_all, lgrid), D) == me
    return insert(m_local, pts_all, mask_all & mine, lgrid, downsample=downsample)


def ring_knn(
    m_local: HashGridMap,
    queries: jnp.ndarray,
    lgrid: GridParams,
    k: int = 5,
    rings: int = 1,
    max_buckets: int | None = None,
    axis_name: str = AXIS,
):
    """KNN against the union of all map shards (inside shard_map).

    `queries` is this device's (N/D, 3) block.  Returns (neighbors (N/D,k,3),
    sq_dists (N/D,k) ascending, valid (N/D,k)) for the home block — identical
    to `mapping.knn` on the unsharded map, because bucket ownership partitions
    the candidate set and top-k is associative under merge.
    """
    D = jax.lax.axis_size(axis_name)
    me = jax.lax.axis_index(axis_name)
    perm = [(i, (i + 1) % D) for i in range(D)]

    n = queries.shape[0]
    best_pts = jnp.zeros((n, k, 3), queries.dtype)
    best_d2 = jnp.full((n, k), jnp.inf, queries.dtype)

    def hop(carry, _):
        q, b_pts, b_d2 = carry
        nb, sq, _ = knn(m_local, q, lgrid, k=k, rings=rings, max_buckets=max_buckets)
        # fold the visiting block's new candidates into its running top-k
        cat_d2 = jnp.concatenate([b_d2, sq], axis=1)            # (n, 2k)
        cat_pts = jnp.concatenate([b_pts, nb], axis=1)          # (n, 2k, 3)
        neg, idx = jax.lax.top_k(-cat_d2, k)
        b_d2 = -neg
        b_pts = jnp.take_along_axis(cat_pts, idx[..., None], axis=1)
        carry = jax.lax.ppermute((q, b_pts, b_d2), axis_name, perm)
        return carry, None

    (q, best_pts, best_d2), _ = jax.lax.scan(
        hop, (queries, best_pts, best_d2), None, length=D
    )
    # after D hops the block is home again (q == queries)
    valid = jnp.isfinite(best_d2)
    return best_pts, jnp.where(valid, best_d2, jnp.inf), valid


def make_sharded_map(mesh: Mesh, grid: GridParams) -> HashGridMap:
    """Allocate the empty sharded map: leaves sharded over AXIS on dim 0.

    Global shapes: keys (T,3), pts (T,S,3), cell_d2 (T,S) — the table rows
    are the sharded dimension — and per-device counters of shape (D,).
    """
    D = mesh.devices.size
    lg = local_grid(grid, D)

    def alloc():
        m = make_map(lg)
        return HashGridMap(
            keys=jnp.broadcast_to(m.keys, (D,) + m.keys.shape).reshape(D * lg.table_size, 3),
            pts=jnp.broadcast_to(m.pts, (D,) + m.pts.shape).reshape(
                D * lg.table_size, lg.slots, 3
            ),
            cell_d2=jnp.broadcast_to(m.cell_d2, (D,) + m.cell_d2.shape).reshape(
                D * lg.table_size, lg.slots
            ),
            num_points=jnp.zeros((D,), jnp.int32),
            num_buckets=jnp.zeros((D,), jnp.int32),
            dropped=jnp.zeros((D,), jnp.int32),
        )

    specs = map_specs()
    shardings = jax.tree.map(lambda s: jax.sharding.NamedSharding(mesh, s), specs)
    return jax.jit(alloc, out_shardings=shardings)()


def map_specs() -> HashGridMap:
    """PartitionSpecs of the sharded map (table rows over AXIS)."""
    return HashGridMap(
        keys=P(AXIS), pts=P(AXIS), cell_d2=P(AXIS), num_points=P(AXIS),
        num_buckets=P(AXIS), dropped=P(AXIS),
    )


# ---------------------------------------------------------------------------
# full LIO step on a sharded map
# ---------------------------------------------------------------------------


def _body(inp: StepInputs, m_local: HashGridMap, static_cfg, lgrid: GridParams):
    """shard_map body: points sharded over AXIS, map table-rows sharded over
    AXIS, filter state replicated.  Mirrors sharding._sharded_body with the
    map-sharded match/insert."""
    x_pred, P_pred = predict_window(inp.x, inp.P, inp.imus_filter, inp.t_integrated, inp.Q)
    # superset-window mask + on-device anchor controls (ADVICE r4 medium —
    # mirrors _lio_step_core; see sharding._sharded_body)
    path_mask = inp.imus_path.mask & (inp.imus_path.t > inp.anchor_t)
    imus_path = inp.imus_path._replace(mask=path_mask)
    anchor_a, anchor_w = _derive_anchor_controls(inp, path_mask)
    path = build_path(inp.anchor, inp.anchor_t, anchor_a, anchor_w, imus_path)

    pts_l2 = compensate(path, inp.anchor, inp.t2, inp.pts, inp.pts_t, inp.pts_mask)
    ds = voxel_downsample(pts_l2, inp.pts_mask, inp.dyn.downsample_prec)
    total_ds = jax.lax.psum(ds.count, AXIS)
    enough = total_ds >= inp.dyn.MAX_POINTS2MATCH

    knn_fn = partial(ring_knn, axis_name=AXIS)
    x_corr, P_corr, diag = iterated_update(
        x_pred, P_pred, m_local, ds.pts, ds.mask, lgrid, static_cfg, inp.dyn,
        axis_name=AXIS,
        knn_fn=lambda m, q, g, k, rings, max_buckets=None: knn_fn(
            m, q, g, k=k, rings=rings, max_buckets=max_buckets
        ),
    )
    x_new = jax.tree.map(lambda c, p: jnp.where(enough, c, p), x_corr, x_pred)
    P_new = jnp.where(enough, P_corr, P_pred)

    R_wl = x_new.R @ x_new.R_LI
    t_wl = x_new.p + (x_new.R @ x_new.t_LI)
    g_ds = jnp.einsum("ij,nj->ni", R_wl, ds.pts) + t_wl
    ins_mask = ds.mask & enough & jnp.asarray(static_cfg.mapping_online)
    m_new = insert_sharded(m_local, g_ds, ins_mask, lgrid, AXIS, downsample=True)

    g_full = jnp.einsum("ij,nj->ni", R_wl, pts_l2) + t_wl
    anchor_new = jax.tree.map(lambda n, o: jnp.where(enough, n, o), x_new, inp.anchor)
    anchor_t_new = jnp.where(enough, jnp.asarray(inp.t2, jnp.float32),
                             jnp.asarray(inp.anchor_t, jnp.float32))
    # local window index → global (see sharding._sharded_body)
    ds_idx_global = ds.idx + jax.lax.axis_index(AXIS) * inp.pts.shape[0]
    return StepOutputs(
        x=x_new, P=P_new, map=m_new, updated=enough, ds_count=total_ds,
        global_pts=g_full, global_mask=inp.pts_mask,
        global_ds=g_ds, global_ds_mask=ds.mask, global_ds_idx=ds_idx_global,
        diag=diag,
        telemetry=make_telemetry(enough, total_ds, diag, x_new, m_new,
                                 anchor_t=anchor_t_new, map_axis=AXIS),
        anchor=anchor_new,
        anchor_t=anchor_t_new,
    )


def make_map_sharded_step(mesh: Mesh, config, grid: GridParams):
    """Jitted LIO step with BOTH point-batch and map-block sharding on `mesh`.

    Input points sharded over AXIS; map table rows sharded over AXIS; the
    23-dim filter state replicated.  The result is numerically identical to
    the single-device step (exact candidate-set partition + psum'd exact
    sums); tested in tests/test_parallel.py.
    """
    static_cfg = config.static() if hasattr(config, "static") else config
    D = mesh.devices.size
    lgrid = local_grid(grid, D)
    from ..filter.update import UpdateDiagnostics

    pt = P(AXIS)
    rep = P()
    rep_tree = lambda proto: jax.tree.map(lambda _: rep, proto, is_leaf=lambda x: x is None)

    def step(inp: StepInputs, m: HashGridMap):
        specs_in = (
            StepInputs(
                anchor=rep_tree(inp.anchor),
                anchor_t=rep, anchor_a=rep, anchor_w=rep,
                x=rep_tree(inp.x),
                P=rep, t_integrated=rep,
                imus_filter=rep_tree(inp.imus_filter),
                imus_path=rep_tree(inp.imus_path),
                pts=pt, pts_t=pt, pts_mask=pt,
                t2=rep, Q=rep,
                dyn=rep_tree(inp.dyn),
            ),
            map_specs(),
        )
        specs_out = StepOutputs(
            x=rep_tree(inp.x),
            P=rep,
            map=map_specs(),
            updated=rep,
            ds_count=rep,
            global_pts=pt,
            global_mask=pt,
            global_ds=pt,
            global_ds_mask=pt,
            global_ds_idx=pt,
            diag=UpdateDiagnostics(rep, rep, rep, rep, rep, pt, pt, pt),
            telemetry=rep,
            anchor=rep_tree(inp.anchor),
            anchor_t=rep,
        )
        f = jax.shard_map(
            partial(_body, static_cfg=static_cfg, lgrid=lgrid),
            mesh=mesh,
            in_specs=specs_in,
            out_specs=specs_out,
            check_vma=False,
        )
        return f(inp, m)

    return jax.jit(step, donate_argnums=(1,))
