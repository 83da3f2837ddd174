"""The core device step: one localization window, end to end, in one jit.

This is the TPU-native equivalent of the reference main-loop body
(`/root/reference/src/main.cpp:55-122`, SURVEY.md §3.3-3.4):

    propagate_to(t2)  →  compensate(t1,t2)  →  voxel downsample  →
    iterated point-to-plane update  →  map insert (online)

The whole chain is a single jitted pure function over fixed-shape, masked
tensors; the map and filter state are explicit pytrees threaded through (and
donated between) calls.  Host code (runtime/) only does index bookkeeping and
padding — no math.

Skip semantics match the reference:
- Map empty → the update naturally no-ops (zero matches) and the map is built
  from this window (Localizator::correct guard + Mapper::add build path).
- Fewer than MAX_POINTS2MATCH downsampled points → no update, no map insert,
  no state append (main.cpp:81 `break`); the prediction still advances.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .deskew.compensate import build_path, compensate, state_at
from .filter.process import ImuWindow, predict_window
from .filter.update import UpdateDiagnostics, iterated_update
from .geometry import so3
from .geometry.state import NavState
from .mapping import GridParams, HashGridMap, insert
from .ops.voxel import voxel_downsample


class StepInputs(NamedTuple):
    # anchor: latest corrected state (deskew reference), its time & controls
    anchor: NavState
    anchor_t: jnp.ndarray       # ()
    anchor_a: jnp.ndarray       # (3,)
    anchor_w: jnp.ndarray       # (3,)
    # filter state at last integration time
    x: NavState
    P: jnp.ndarray              # (23,23)
    t_integrated: jnp.ndarray   # () filter's last_time_integrated
    # IMU windows (padded): filter covers (t_integrated, t2], path covers
    # (anchor_t, t2] — identical in steady state, distinct after skips
    imus_filter: ImuWindow
    imus_path: ImuWindow
    # raw LiDAR window [t1, t2], LiDAR frame, absolute per-point stamps
    pts: jnp.ndarray            # (N,3)
    pts_t: jnp.ndarray          # (N,)
    pts_mask: jnp.ndarray       # (N,)
    t2: jnp.ndarray             # ()
    Q: jnp.ndarray              # (12,12) process noise
    dyn: object                 # config.DynParams — traced thresholds/noises


class StepOutputs(NamedTuple):
    x: NavState                 # corrected (or predicted, if skipped) @ t2
    P: jnp.ndarray
    map: HashGridMap
    updated: jnp.ndarray        # () bool — window had enough points
    ds_count: jnp.ndarray       # () int32 downsampled-point count
    global_pts: jnp.ndarray     # (N,3) deskewed window in world frame (full res)
    global_mask: jnp.ndarray    # (N,)
    global_ds: jnp.ndarray      # (N,3) downsampled window in world frame —
                                # the /limovelo/pcl content (main.cpp:92-93)
    global_ds_mask: jnp.ndarray # (N,)
    global_ds_idx: jnp.ndarray  # (N,) original window index per ds row, for
                                # gathering per-point side channels
                                # (intensity) on the host at publish time
    diag: UpdateDiagnostics
    telemetry: jnp.ndarray      # (TELEMETRY_DIM,) f32 — everything the host
                                # needs per step, in ONE buffer (layout in
                                # `make_telemetry`).  The runtime reads back
                                # only this vector: on a tunneled TPU every
                                # device→host buffer costs a full RPC round
                                # trip (~30 ms measured), so a multi-buffer
                                # readback pays that once per buffer
    # deskew anchor threaded ON DEVICE: the corrected state at the latest
    # accepted update (BUFFER_X head, main.cpp:85-88).  Keeping the anchor a
    # device value means the host never needs the per-step `updated` flag to
    # run the NEXT dispatch — the enabler for the depth-K async readback
    # pipeline (runtime/pipeline.py): one device→host read of any step output
    # degrades this runtime's blocking dispatch latency ~100×, so the host
    # resolves telemetry with a lag instead of per step
    anchor: NavState
    anchor_t: jnp.ndarray       # () rebased seconds


#: telemetry vector layout (see make_telemetry)
TEL_UPDATED = 0
TEL_DS_COUNT = 1
TEL_MATCHES = 2
TEL_RESIDUAL = 3
TEL_ITERS = 4
TEL_R = slice(5, 14)            # row-major rotation
TEL_P = slice(14, 17)
TEL_V = slice(17, 20)
TEL_EIG = slice(20, 32)         # HᵀH eigenvalues at the final GN iteration
                                # (print_degeneracy_values analog, main.cpp:156)
TEL_EXT_R = slice(32, 35)       # Log(R_LI) rotation vector
TEL_EXT_T = slice(35, 38)       # t_LI (print_extrinsics analog, main.cpp:96)
TEL_MAP_POINTS = 38
TEL_MAP_BUCKETS = 39
TEL_MAP_DROPPED = 40            # cumulative saturation drops (hashgrid.insert)
TEL_DELTA_NORM = 41
TEL_ANCHOR_T = 42               # rebased anchor time after this step — the
                                # host's (lagged) lower bound for selecting
                                # the next IMU path windows
TELEMETRY_DIM = 43


@partial(jax.jit, static_argnames=("static_cfg", "grid"), donate_argnums=(0,))
def mapping_step(
    m: HashGridMap,
    anchor: NavState,
    anchor_t,
    anchor_a,
    anchor_w,
    imus_path: ImuWindow,
    x_t2: NavState,
    t2,
    pts,
    pts_t,
    pts_mask,
    dyn,
    static_cfg,
    grid: GridParams,
):
    """Offline-mode map update (main.cpp:107-117): re-deskew the FULL last
    rotation with the final corrected states, downsample, insert globally.

    Returns (map', global full-res points, global mask, global ds points,
    ds mask) — `high_quality_publish` streams the full-resolution cloud,
    otherwise the downsampled one (main.cpp:115-116)."""
    path = build_path(anchor, anchor_t, anchor_a, anchor_w, imus_path)
    pts_l2 = compensate(path, anchor, t2, pts, pts_t, pts_mask)
    R_wl = x_t2.R @ x_t2.R_LI
    t_wl = x_t2.p + (x_t2.R @ x_t2.t_LI)
    g_full = jnp.einsum("ij,nj->ni", R_wl, pts_l2) + t_wl
    ds = voxel_downsample(g_full, pts_mask, dyn.downsample_prec)
    m_new = insert(m, ds.pts, ds.mask, grid, downsample=True)
    return m_new, g_full, pts_mask, ds.pts, ds.mask, ds.idx


def make_telemetry(
    enough, ds_count, diag: UpdateDiagnostics, x_new: NavState,
    m_new: HashGridMap, anchor_t=None, map_axis: str | None = None,
) -> jnp.ndarray:
    """(TELEMETRY_DIM,) f32 — the single per-step readback buffer (TEL_*
    indices above).  Carries everything the host bookkeeping + observability
    layer consume: update outcome, pose/velocity, degeneracy eigenvalues,
    online extrinsics, and map occupancy/saturation counters.

    `map_axis`: inside a shard_map whose map counters are device-local
    (map-block sharding), name the mesh axis so the counters are psum'd —
    telemetry must be replicated."""
    # sharded maps carry per-device (D,) counters; reduce to global scalars
    map_pts = jnp.sum(m_new.num_points).astype(jnp.float32)
    map_bks = jnp.sum(m_new.num_buckets).astype(jnp.float32)
    map_drop = jnp.sum(m_new.dropped).astype(jnp.float32)
    if map_axis is not None:
        map_pts, map_bks, map_drop = jax.lax.psum(
            (map_pts, map_bks, map_drop), map_axis
        )
    return jnp.concatenate([
        jnp.stack([
            enough.astype(jnp.float32),
            ds_count.astype(jnp.float32),
            diag.num_matches.astype(jnp.float32),
            diag.mean_residual.astype(jnp.float32),
            diag.iterations.astype(jnp.float32),
        ]),
        x_new.R.reshape(-1).astype(jnp.float32),
        x_new.p.astype(jnp.float32),
        x_new.v.astype(jnp.float32),
        diag.eigenvalues.astype(jnp.float32),
        so3.log(x_new.R_LI).astype(jnp.float32),
        x_new.t_LI.astype(jnp.float32),
        jnp.stack([map_pts, map_bks, map_drop,
                   diag.delta_norm.astype(jnp.float32),
                   jnp.asarray(-1.0 if anchor_t is None else anchor_t,
                               jnp.float32).reshape(())]),
    ])


def _derive_anchor_controls(inp: StepInputs, path_mask: jnp.ndarray):
    """Controls at the anchor = the first IMU sample after anchor_t
    (`Accumulator::get_next_imu` semantics, Accumulator.cpp:74-80) — derived
    ON DEVICE from the path window so the host may pass a SUPERSET window
    selected from a stale (lagged) anchor lower bound.  Falls back to the
    host-provided inp.anchor_a/anchor_w when the window holds no sample."""
    any_valid = jnp.any(path_mask)
    first = jnp.argmax(path_mask)
    a = jnp.where(any_valid, inp.imus_path.a[first], inp.anchor_a)
    w = jnp.where(any_valid, inp.imus_path.w[first], inp.anchor_w)
    return a, w


def _lio_step_core(inp: StepInputs, m: HashGridMap, static_cfg, grid: GridParams) -> StepOutputs:
    # ---- Step 1a: IMU propagation (Localizator::propagate_to) ----
    x_pred, P_pred = predict_window(inp.x, inp.P, inp.imus_filter, inp.t_integrated, inp.Q)

    # ---- Step 1b: motion deskew (Compensator::compensate) ----
    # mask the path window to strictly-after-anchor samples: build_path's
    # integration assumes every valid entry follows the anchor, and the host
    # may deliver a superset window when its anchor knowledge lags (the
    # depth-K readback pipeline — see StepOutputs.anchor)
    path_mask = inp.imus_path.mask & (inp.imus_path.t > inp.anchor_t)
    imus_path = inp.imus_path._replace(mask=path_mask)
    anchor_a, anchor_w = _derive_anchor_controls(inp, path_mask)
    path = build_path(inp.anchor, inp.anchor_t, anchor_a, anchor_w, imus_path)
    pts_l2 = compensate(path, inp.anchor, inp.t2, inp.pts, inp.pts_t, inp.pts_mask)

    # ---- Step 1c: spatial downsample (Compensator::downsample) ----
    ds = voxel_downsample(pts_l2, inp.pts_mask, inp.dyn.downsample_prec)
    enough = ds.count >= inp.dyn.MAX_POINTS2MATCH

    # ---- Step 1d: iterated point-to-plane update (Localizator::correct) ----
    x_corr, P_corr, diag = iterated_update(
        x_pred, P_pred, m, ds.pts, ds.mask, grid, static_cfg, inp.dyn
    )
    x_new = jax.tree.map(lambda c, p: jnp.where(enough, c, p), x_corr, x_pred)
    P_new = jnp.where(enough, P_corr, P_pred)

    # ---- Step 2: mapping (Mapper::add, online) ----
    # place the downsampled window globally with the corrected pose
    R_wl = x_new.R @ x_new.R_LI
    t_wl = x_new.p + (x_new.R @ x_new.t_LI)
    g_ds = jnp.einsum("ij,nj->ni", R_wl, ds.pts) + t_wl
    ins_mask = ds.mask & enough & jnp.asarray(static_cfg.mapping_online)
    m_new = insert(m, g_ds, ins_mask, grid, downsample=True)

    # full-resolution window in world frame, for publishing / offline mapping
    g_full = jnp.einsum("ij,nj->ni", R_wl, pts_l2) + t_wl

    # anchor threading (BUFFER_X head): advances to the corrected state when
    # the window updated, else carries the previous anchor — all on device
    anchor_new = jax.tree.map(lambda n, o: jnp.where(enough, n, o), x_new, inp.anchor)
    anchor_t_new = jnp.where(enough, jnp.asarray(inp.t2, jnp.float32),
                             jnp.asarray(inp.anchor_t, jnp.float32))

    telemetry = make_telemetry(enough, ds.count, diag, x_new, m_new,
                               anchor_t=anchor_t_new)

    return StepOutputs(
        x=x_new,
        P=P_new,
        map=m_new,
        updated=enough,
        ds_count=ds.count,
        global_pts=g_full,
        global_mask=inp.pts_mask,
        global_ds=g_ds,
        global_ds_mask=ds.mask,
        global_ds_idx=ds.idx,
        diag=diag,
        telemetry=telemetry,
        anchor=anchor_new,
        anchor_t=anchor_t_new,
    )


lio_step = partial(jax.jit, static_argnames=("static_cfg", "grid"), donate_argnums=(1,))(
    _lio_step_core
)


# ---------------------------------------------------------------------------
# packed host→device entry
# ---------------------------------------------------------------------------
#
# On a tunneled TPU every `jnp.asarray`/`device_put` is its own RPC with
# ~30 ms of round-trip latency; `step_window` naively issues ~15 of them
# (points, stamps, masks, two IMU windows split in four arrays each, controls,
# scalars) — ~450 ms of pure latency per 0.27 ms device step.  The packed
# entry moves ALL per-step host inputs in ONE flat f32 buffer and unpacks on
# device (free: XLA fuses the slices into the consumers).

_HDR = 9  # anchor_t, t_integrated, t2, anchor_a(3), anchor_w(3)


def pack_host_inputs(
    anchor_t: float, t_integrated: float, t2: float,
    anchor_a, anchor_w,
    imu_f,      # (t (If,), a (If,3), w (If,3), mask (If,)) numpy
    imu_p,      # same for the path window (Ip,)
    pts, pts_t, mask,  # (B,3), (B,), (B,) numpy
):
    """Concatenate every per-step host input into one f32 vector (host side)."""
    import numpy as np

    parts = [
        np.array([anchor_t, t_integrated, t2], np.float32),
        np.asarray(anchor_a, np.float32).ravel(),
        np.asarray(anchor_w, np.float32).ravel(),
    ]
    for (t, a, w, msk) in (imu_f, imu_p):
        parts += [t.ravel(), a.ravel(), w.ravel(), msk.astype(np.float32)]
    parts += [
        np.asarray(pts, np.float32).ravel(),
        np.asarray(pts_t, np.float32).ravel(),
        np.asarray(mask, np.float32),
    ]
    return np.concatenate(parts)


def _unpack_imus(buf, off, n):
    t = jax.lax.dynamic_slice_in_dim(buf, off, n)
    a = jax.lax.dynamic_slice_in_dim(buf, off + n, 3 * n).reshape(n, 3)
    w = jax.lax.dynamic_slice_in_dim(buf, off + 4 * n, 3 * n).reshape(n, 3)
    msk = jax.lax.dynamic_slice_in_dim(buf, off + 7 * n, n) > 0.5
    return ImuWindow(t=t, a=a, w=w, mask=msk), off + 8 * n


@partial(
    jax.jit,
    static_argnames=("n_pts", "n_imu_f", "n_imu_p", "static_cfg", "grid"),
    donate_argnums=(6,),
)
def lio_step_packed(
    packed: jnp.ndarray,        # (9 + 8*(If+Ip) + 5*B,) f32
    x: NavState,
    P: jnp.ndarray,
    anchor: NavState,
    anchor_t: jnp.ndarray,      # () device scalar, threaded from the previous
                                # step's out.anchor_t (packed[0] is only the
                                # host's stale lower bound used to SELECT the
                                # path window; the true anchor time lives on
                                # device — see StepOutputs.anchor)
    Q: jnp.ndarray,
    m: HashGridMap,
    dyn,
    n_pts: int,
    n_imu_f: int,
    n_imu_p: int,
    static_cfg,
    grid: GridParams,
) -> StepOutputs:
    """`lio_step` fed from one packed host buffer (see `pack_host_inputs`)."""
    B = n_pts
    imus_f, off = _unpack_imus(packed, _HDR, n_imu_f)
    imus_p, off = _unpack_imus(packed, off, n_imu_p)
    pts = jax.lax.dynamic_slice_in_dim(packed, off, 3 * B).reshape(B, 3)
    pts_t = jax.lax.dynamic_slice_in_dim(packed, off + 3 * B, B)
    pts_mask = jax.lax.dynamic_slice_in_dim(packed, off + 4 * B, B) > 0.5

    inp = StepInputs(
        anchor=anchor,
        anchor_t=anchor_t,
        anchor_a=packed[3:6],
        anchor_w=packed[6:9],
        x=x,
        P=P,
        t_integrated=packed[1],
        imus_filter=imus_f,
        imus_path=imus_p,
        pts=pts,
        pts_t=pts_t,
        pts_mask=pts_mask,
        t2=packed[2],
        Q=Q,
        dyn=dyn,
    )
    return _lio_step_core(inp, m, static_cfg, grid)
