"""The orchestrator: drives the localize→map loop over accumulated sensors.

TPU-native analog of the reference main loop (`/root/reference/src/main.cpp:
52-130`, SURVEY.md §3.3-3.4): time management (t1/t2/delta schedule), the
per-window device step, online/offline mapping cadence, and buffer GC.
Host code here only does index bookkeeping, padding and recording — all math
runs inside the single jitted `lio_step`.
"""

from __future__ import annotations

import time as _time
from collections import deque
from dataclasses import dataclass, field
from typing import List, NamedTuple, Optional

import numpy as np

import jax
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

from ..deskew.compensate import build_path, compensate
from ..config import DynParams
from ..filter.process import ImuWindow, process_noise_Q
from ..geometry import state as st
from ..mapping import GridParams, insert, make_map, prune
from ..ops.voxel import voxel_downsample
from ..step import StepInputs, lio_step, lio_step_packed, mapping_step, pack_host_inputs
from .accumulator import Accumulator
from .profiling import StageTimers


@dataclass
class StepRecord:
    """Structured per-update metrics — the observability surface replacing the
    reference's ROS topics + couts (SURVEY.md §5)."""

    t: float
    R: np.ndarray
    p: np.ndarray
    v: np.ndarray
    updated: bool
    ds_count: int
    num_matches: int
    mean_residual: float
    iterations: int
    wall_ms: float
    # degeneracy eigenvalues of HᵀH at the final GN iteration
    # (print_degeneracy_values, main.cpp:156)
    eigenvalues: np.ndarray = field(default_factory=lambda: np.zeros(12))
    # online extrinsics estimate (print_extrinsics, main.cpp:96)
    extr_rotvec: np.ndarray = field(default_factory=lambda: np.zeros(3))
    extr_t: np.ndarray = field(default_factory=lambda: np.zeros(3))
    # map occupancy / saturation (hashgrid counters)
    map_points: int = 0
    map_buckets: int = 0
    map_dropped: int = 0
    delta_norm: float = 0.0


@dataclass
class OdometryResult:
    records: List[StepRecord] = field(default_factory=list)

    @property
    def times(self):
        return np.array([r.t for r in self.records])

    @property
    def positions(self):
        return np.stack([r.p for r in self.records]) if self.records else np.zeros((0, 3))

    @property
    def rotations(self):
        return np.stack([r.R for r in self.records]) if self.records else np.zeros((0, 3, 3))


class AnchorRec(NamedTuple):
    """One BUFFER_X entry: corrected state at an accepted update.  `R_h`/`p_h`
    are HOST copies of the pose (from telemetry) so publishing the state
    history never reads the device (a device→host read costs a ~26 ms RPC
    round trip on a tunneled TPU once the runtime is in degraded-readback
    mode — see `_PendingStep`)."""

    t: float
    x: object          # NavState (device)
    a: np.ndarray      # controls seeding a re-deskew path from this anchor
    w: np.ndarray
    R_h: Optional[np.ndarray] = None
    p_h: Optional[np.ndarray] = None


class _TelemetryBatch:
    """One device→host transfer covering a BATCH of steps' telemetry.

    Every telemetry read pays a full tunnel round trip (~26-50 ms once the
    runtime is in degraded-readback mode), so per-step transfers cap the
    pipeline at ~1/roundtrip updates/s.  Instead, K per-step telemetry
    vectors are stacked into ONE device buffer by a tiny (non-donated) jit
    and read back with ONE blocking device_get when the batch's compute has
    landed (`fetch.is_ready()`) — one round trip amortized over the whole
    batch.

    r5 measurement (probe_donate): `copy_to_host_async()` — the r4 design —
    STALLS the degraded runtime's execution stream ~300 ms per call, which
    was the real "33× wall gap" (BENCH.md r05).  A plain blocking read of a
    ready buffer costs only the ~26 ms RPC, so the async prefetch is gone."""

    __slots__ = ("fetch", "dispatched_at", "_host")

    #: readbacks slower than this raise an alarm (BENCH_r04 recorded a
    #: first readback of 70 s after a heavy session — session-threatening
    #: on a tunneled runtime; the alarm makes it visible instead of a
    #: silent stall, VERDICT r4 weak#8)
    SLOW_READBACK_S = 5.0
    _alarmed = False

    def __init__(self, fetch, dispatched_at):
        self.fetch = fetch
        self.dispatched_at = dispatched_at
        self._host = None

    def row(self, i) -> np.ndarray:
        if self._host is None:
            t0 = _time.perf_counter()
            self._host = np.asarray(jax.device_get(self.fetch))
            took = _time.perf_counter() - t0
            if took > self.SLOW_READBACK_S and not _TelemetryBatch._alarmed:
                _TelemetryBatch._alarmed = True
                import logging

                logging.getLogger(__name__).error(
                    "device->host telemetry readback took %.1f s (threshold "
                    "%.0f s) — the runtime has entered a degraded/abort-prone "
                    "readback mode (see BENCH.md 'readback pathology'); "
                    "expect slow resolution or a tunnel abort. Consider "
                    "checkpointing now.", took, self.SLOW_READBACK_S)
        return self._host[i]


@jax.jit
def _stack_telemetry(tels):
    return jnp.stack(tels)


@dataclass
class _PendingStep:
    """A dispatched-but-unresolved step.

    The tunneled TPU runtime this targets has a measured pathology
    (debug_readback*.py, BENCH.md): after the FIRST device→host read of any
    buffer, every *blocking* dispatch costs a ~26 ms RPC round trip — but
    enqueue throughput stays ~1.5 ms/step and an async-copied buffer read
    ≥~50 ms after its copy started costs ~0.01 ms.  So the pipeline keeps a
    depth-K queue of dispatched steps, batches their telemetry vectors into
    one stacked transfer per K steps (`_TelemetryBatch`), and resolves
    entries only once their batch's copy has had time to land (or flush()
    forces it).  The deskew anchor is threaded ON DEVICE
    (step.StepOutputs.anchor) so no dispatch ever waits on a readback."""

    t2: float
    rebase: float
    out: object            # StepOutputs (map buffer donated to the next step)
    anchor_a: np.ndarray
    anchor_w: np.ndarray
    tel: object            # this step's telemetry device array
    wall_dispatch_ms: float
    win_int: np.ndarray
    dispatched_at: float   # host perf_counter at dispatch (age gating)
    advanced: bool = False  # host optimistically advanced last_time_updated
    batch: Optional[_TelemetryBatch] = None
    row: int = -1


class LioPipeline:
    """Feed sensors in (any interleaving), call `spin()`, read trajectory out.

    `max_inflight` bounds the dispatch-ahead depth.  `readback_lag_s=None`
    picks a backend default: 0 on CPU (reads are free; batches close every
    dispatch, so resolution runs at the depth-1 cadence), 50 ms on
    accelerators.  With a nonzero lag, a batch resolves as soon as its
    compute has landed (`is_ready()`), or unconditionally at the 10×lag age
    ceiling (bounds live-record latency).  `defer_readback` (auto: on when
    no publisher and no prune policy) postpones ALL telemetry reads to
    flush() so a replay streams at clean-mode speed on the tunneled TPU
    runtime (see the class comments / BENCH.md r05).  All three knobs are
    no-ops for correctness — resolution is order-preserving and flush()
    drains."""

    def __init__(self, config, grid: Optional[GridParams] = None, publisher=None,
                 max_inflight: int = 8, readback_lag_s: Optional[float] = None,
                 mesh=None, shard: str = "points", defer_readback: Optional[bool] = None):
        self.config = config
        self.grid = grid or GridParams.from_config(config)
        self.accum = Accumulator(config)
        # multi-chip dispatch (SURVEY.md §7 step 8): `mesh` a jax.sharding.Mesh
        # switches the per-window dispatch to a shard_map step — shard="points"
        # point-shards the window (psum'd normal equations, map replicated;
        # parallel/sharding.py), shard="map" additionally partitions the map
        # table rows across devices (D× capacity, ring-ppermute KNN;
        # parallel/map_sharding.py).  Both are numerically identical to the
        # single-device step.
        self.mesh = mesh
        self.shard = shard
        self._sharded_step = None
        if mesh is not None:
            if config.mapping_mode == "offline":
                raise ValueError(
                    "mesh mode supports mapping 'online' or 'none'; the "
                    "offline re-deskew mapping step is single-device")
            if shard == "map":
                from ..parallel import map_sharding as _ms

                self._sharded_step = _ms.make_map_sharded_step(mesh, config, self.grid)
            elif shard == "points":
                from ..parallel.sharding import make_sharded_step

                self._sharded_step = make_sharded_step(mesh, config, self.grid)
            else:
                raise ValueError(f"shard must be 'points' or 'map', got {shard!r}")
        self._result = OdometryResult()
        self.publisher = publisher  # runtime.publishers.Publisher or None
        self.max_inflight = max(1, int(max_inflight))
        if readback_lag_s is None:
            readback_lag_s = 0.0 if jax.default_backend() == "cpu" else 0.05
        self.readback_lag_s = float(readback_lag_s)
        # defer ALL telemetry readbacks to flush():  on the tunneled TPU
        # runtime the FIRST device→host read flips the process into a mode
        # where the step PROGRAM executes at ~28 ms (vs 0.2 ms clean) —
        # measured r5, probe_realstep, BENCH.md.  With the optimistic anchor
        # bound nothing on the host needs telemetry mid-run, so an offline
        # replay can stream read-free at clean-mode speed and pay the mode
        # flip once at the end.  Auto-on when nothing consumes telemetry
        # mid-run: no publisher, online mapping (offline-mode re-deskew needs
        # resolved anchors), no prune policy.  Entries are capped at
        # `defer_cap` pending steps as a memory bound.
        if defer_readback is None:
            # offline mapping also streams read-free now (dispatch-time
            # anchor history feeds the rotation-cadence re-deskew)
            defer_readback = (publisher is None
                              and config.map_prune_radius <= 0)
        self.defer_readback = bool(defer_readback)
        self.defer_cap = 4096

        self._initialized = False
        self.map = None
        self.x = None
        self.P = None
        self.Q = process_noise_Q(config)
        self.dyn = DynParams.from_config(config)
        self._static = config.static()
        # times are kept in absolute float64 on host; rebased on device entry
        self.t2: Optional[float] = None
        self.last_time_updated: Optional[float] = None     # Localizator analog
        self.last_time_integrated: Optional[float] = None
        # the TRUE anchor lives on device (threaded through lio_step_packed);
        # `anchor_t` is the host's conservative LOWER BOUND on the anchor
        # time, refreshed from telemetry at resolution — it only selects
        # which IMU superset window to ship (the device masks to > anchor_t)
        self.anchor = None
        self.anchor_t: Optional[float] = None
        self.anchor_t_dev = None
        self.last_map_time: Optional[float] = None         # Mapper::hasToMap
        # recent corrected states (BUFFER_X analog).  `_anchors` is appended
        # at RESOLUTION (host pose copies ride along — feeds the states
        # publisher and checkpointing); `_anchors_d` is appended at DISPATCH
        # (device refs only, no readback) and feeds the offline-mapping
        # re-deskew so the rotation-cadence map update never has to wait for
        # a telemetry readback (r5: keeps offline-mode replays read-free)
        self._anchors: List[AnchorRec] = []
        self._anchors_d: List[AnchorRec] = []
        self._last_prune_t: Optional[float] = None
        self.stream_dead = False   # set when the sensor stream dies (ended())
        self._last_processed_t2: float = -np.inf
        self._pending = deque()   # in-flight steps awaiting host bookkeeping
        self._seen_shapes = set()  # (bucket, imu_f, imu_p) combos compiled
        # windows whose RAW count cleared MAX_POINTS2MATCH but whose voxel
        # downsample collapsed below it — consumed without retry (documented
        # deviation from main.cpp:81; counted so the deviation is observable)
        self.collapsed_windows = 0
        # always-on per-stage wall timers over the dispatch/resolve hot loop
        # (VERDICT r4 weak#1: the 1.7 ms-p50-dispatch vs 56 ms-mean-wall gap
        # must be decomposable from the record; print `timers.report()`)
        self.timers = StageTimers()

    # ------------------------------------------------------------------
    @property
    def result(self) -> OdometryResult:
        """The trajectory so far; resolves all in-flight steps first."""
        self._resolve_all()
        return self._result

    # ------------------------------------------------------------------
    @classmethod
    def from_hd_map(cls, config, map_path: str, grid: Optional[GridParams] = None):
        """Prelocalization mode: start localizing against a prebuilt HD map
        (the reference's unfinished `hdmaps` feature, README.md:64-68).

        Unless the config sets `mapping` explicitly, the map is FROZEN
        (mapping mode "none"): no window is ever inserted, so the prebuilt
        map stays bit-identical for the whole run.  Pass
        config.replace(mapping="online"/"offline") to extend the HD map
        instead."""
        from .checkpoint import load_map

        if config.mapping is None:
            config = config.replace(mapping="none")
        pipe = cls(config, grid=grid)
        pipe._preloaded_map = load_map(map_path, pipe.grid)
        return pipe

    # ------------------------------------------------------------------
    def add_scan(self, pts, t, intensity=None):
        self.accum.add_scan(pts, t, intensity=intensity)

    def add_imu(self, t, a, w, q=None):
        self.accum.add_imu(t, a, w, q)

    # ------------------------------------------------------------------
    def _initialize(self):
        """Deferred init once enough IMUs buffered (Accumulator.cpp:103-115,
        Localizator::initialize/init_IKFoM_state)."""
        imu0 = self.accum.initial_imu()
        R0 = None
        if imu0.q is not None:
            R0 = Rsc.from_quat(imu0.q).as_matrix()
        self.x = st.make_initial(self.config, R0=R0)
        self.P = st.initial_covariance(self.config)
        self.map = getattr(self, "_preloaded_map", None)
        if self.map is None:
            if self.mesh is not None and self.shard == "map":
                from ..parallel.map_sharding import make_sharded_map

                self.map = make_sharded_map(self.mesh, self.grid)
            else:
                self.map = make_map(self.grid)
        elif self.mesh is not None and self.shard == "map":
            raise ValueError("HD-map prelocalization is not supported with "
                             "map-block sharding; use shard='points'")
        t0 = self.accum.initial_time
        self.t2 = t0
        self.last_time_updated = t0
        self.last_time_integrated = t0
        self.anchor = self.x
        self.anchor_t = t0
        self.anchor_t_dev = jnp.float32(0.0)   # rebased
        self._initialized = True

    # ------------------------------------------------------------------
    def _pad_imus_np(self, ts, accs, gyrs, t2, rebase):
        """Build padded numpy IMU arrays covering (·, t2] with the reference's
        final extrapolation entry (Localizator.cpp:69-74)."""
        cfg = self.config
        m = len(ts)
        entries_t = list(ts - rebase)
        entries_a = list(accs)
        entries_w = list(gyrs)
        if m > 0 and ts[-1] < t2:
            entries_t.append(t2 - rebase)
            entries_a.append(accs[-1])
            entries_w.append(gyrs[-1])
        M = len(entries_t)
        bucket = cfg.bucket_for(max(M, 1), cfg.imu_buckets)
        t_arr = np.zeros(bucket, np.float32)
        a_arr = np.zeros((bucket, 3), np.float32)
        w_arr = np.zeros((bucket, 3), np.float32)
        mask = np.zeros(bucket, bool)
        if M:
            t_arr[:M] = entries_t
            a_arr[:M] = entries_a
            w_arr[:M] = entries_w
            mask[:M] = True
        return t_arr, a_arr, w_arr, mask

    def _pad_imus(self, ts, accs, gyrs, t2, rebase):
        t_arr, a_arr, w_arr, mask = self._pad_imus_np(ts, accs, gyrs, t2, rebase)
        return ImuWindow(
            jnp.asarray(t_arr), jnp.asarray(a_arr), jnp.asarray(w_arr), jnp.asarray(mask)
        )

    # ------------------------------------------------------------------
    def step_window(self, t1: float, t2: float) -> None:
        """Dispatch one localization window [t1, t2] (main.cpp Step 1-3).

        Bookkeeping that depends on device values is deferred to
        `_resolve_ready()` (subsequent spins / `flush()`) so the telemetry
        readback lands in the background while the host keeps dispatching."""
        # bound the queue at two batches (deferred mode: only the memory cap)
        bound = self.defer_cap if self.defer_readback else 2 * self.max_inflight
        if len(self._pending) >= bound:
            self._resolve_one()
        cfg = self.config
        wall0 = _time.perf_counter()
        rebase = self.accum.initial_time

        with self.timers("assemble"):
            pts, pts_t, pts_i = self.accum.get_points(t1, t2)
            n = len(pts)
            bucket = cfg.bucket_for(max(n, 1), cfg.point_buckets)
            if n > bucket:  # overfull window: keep the newest points
                pts, pts_t, pts_i = pts[-bucket:], pts_t[-bucket:], pts_i[-bucket:]
                n = bucket
            pts_pad = np.zeros((bucket, 3), np.float32)
            t_pad = np.zeros(bucket, np.float32)
            mask = np.zeros(bucket, bool)
            int_pad = np.zeros(bucket, np.float32)
            pts_pad[:n] = pts
            t_pad[:n] = (pts_t - rebase).astype(np.float32)
            mask[:n] = True
            int_pad[:n] = pts_i

            imu_f = self._pad_imus_np(*self.accum.get_imus(self.last_time_integrated, t2), t2, rebase)
        # path window: a SUPERSET from the host's lagged anchor lower bound;
        # the device masks to entries strictly after its own anchor_t.  Bound
        # the staleness first: a window outgrowing the largest configured IMU
        # bucket would force a fresh executable compile (config.bucket_for
        # grows past the list) — resolving the oldest pending step refreshes
        # the bound instead.
        max_imu = max(cfg.imu_buckets)
        while (self._pending
               and (t2 - self.anchor_t) * cfg.imu_rate + 4 > max_imu):
            self._resolve_one()
        with self.timers("assemble"):
            imu_p = self._pad_imus_np(*self.accum.get_imus(self.anchor_t, t2), t2, rebase)

            nxt = self.accum.get_next_imu(self.anchor_t)
            anchor_a = nxt.a if nxt is not None else np.zeros(3, np.float32)
            anchor_w = nxt.w if nxt is not None else np.zeros(3, np.float32)

        # first time this (bucket, imu-window) shape combination appears, the
        # dispatch below COMPILES a new executable (and serializes it to the
        # persistent cache) — quiesce the in-flight async queue first: a
        # cache write racing live donated executions has been observed to
        # segfault XLA:CPU's serializer mid-suite
        sig = ("step", bucket, len(imu_f[0]), len(imu_p[0]))
        if sig not in self._seen_shapes:
            self._seen_shapes.add(sig)
            self._quiesce()

        if self._sharded_step is not None:
            # multi-chip dispatch: explicit StepInputs; jit + shard_map place
            # each leaf per its PartitionSpec (points sharded, state/map per
            # the factory's specs)
            D = int(self.mesh.devices.size)
            assert bucket % D == 0, (
                f"point bucket {bucket} must divide across the {D}-device mesh")
            inp = StepInputs(
                anchor=self.anchor,
                anchor_t=self.anchor_t_dev,
                anchor_a=jnp.asarray(anchor_a, jnp.float32),
                anchor_w=jnp.asarray(anchor_w, jnp.float32),
                x=self.x, P=self.P,
                t_integrated=jnp.float32(self.last_time_integrated - rebase),
                imus_filter=ImuWindow(*(jnp.asarray(v) for v in imu_f)),
                imus_path=ImuWindow(*(jnp.asarray(v) for v in imu_p)),
                pts=jnp.asarray(pts_pad), pts_t=jnp.asarray(t_pad),
                pts_mask=jnp.asarray(mask),
                t2=jnp.float32(t2 - rebase), Q=self.Q, dyn=self.dyn,
            )
            out = self._sharded_step(inp, self.map)
        else:
            # ONE host→device transfer for all per-step inputs (a tunneled TPU
            # pays a full RPC round trip per buffer — see step.lio_step_packed)
            with self.timers("pack"):
                packed = pack_host_inputs(
                    self.anchor_t - rebase, self.last_time_integrated - rebase,
                    t2 - rebase, anchor_a, anchor_w, imu_f, imu_p,
                    pts_pad, t_pad, mask,
                )
            with self.timers("h2d"):
                packed_dev = jnp.asarray(packed)
            with self.timers("dispatch"):
                out = lio_step_packed(
                    packed_dev, self.x, self.P, self.anchor,
                    self.anchor_t_dev, self.Q, self.map, self.dyn,
                    n_pts=bucket, n_imu_f=len(imu_f[0]), n_imu_p=len(imu_p[0]),
                    static_cfg=self._static, grid=self.grid,
                )

        self.map = out.map
        self.x = out.x
        self.P = out.P
        self.anchor = out.anchor
        self.anchor_t_dev = out.anchor_t
        self.last_time_integrated = t2
        # optimistic `last_time_updated` advance: the next window's t1 must
        # not re-include this window's points, and waiting for the update
        # flag would couple scheduling to the (lagged) readback.  The host
        # advances when the RAW count clears MAX_POINTS2MATCH — the update
        # only fails beyond that if voxel downsampling collapses the window
        # below the threshold, and such a window is NOT retried (documented
        # deviation from main.cpp:81's retry; resolution never moves the
        # bound backwards).
        advanced = n >= cfg.MAX_POINTS2MATCH
        if advanced:
            self.last_time_updated = t2
            # optimistic anchor bound advance (r5, the 17.8→100+ updates/s
            # fix): when the raw count clears the threshold the device anchor
            # advances to t2 unless the voxel downsample collapses the
            # window (rare; counted in collapsed_windows).  Advancing the
            # host's lower bound here keeps the IMU path-window staleness at
            # ~one window, so the staleness loop above almost never forces a
            # BLOCKING telemetry resolve (each cost a ~135 ms queue-drain
            # RPC — the whole r4 "33× wall gap", see BENCH.md r05).  On the
            # rare collapse, resolution detects it and rolls the bound back
            # to the device truth; the affected in-flight windows deskewed
            # with a degraded (late-anchored) path for a few steps.
            self.anchor_t = max(self.anchor_t, t2)
            if self.last_map_time is None:
                # offline-mapping cadence starts at the first update; anchor
                # it to data time here so the schedule never depends on when
                # the telemetry readback happens to land
                self.last_map_time = t2

        # NOTE (r5): cloud/plane sinks read their buffers with plain blocking
        # device_get at resolution time.  The r4 design prefetched them here
        # with copy_to_host_async — measured to STALL the degraded runtime's
        # execution stream ~300 ms per call (probe_donate, BENCH.md r05);
        # a blocking read of landed compute costs only the ~26 ms RPC.
        self._pending.append(_PendingStep(
            t2, rebase, out, anchor_a, anchor_w, out.telemetry,
            (_time.perf_counter() - wall0) * 1e3, int_pad,
            _time.perf_counter(), advanced,
        ))
        # one stacked device→host transfer per max_inflight steps: the
        # bookkeeping that needs telemetry resolves once the batch's copy
        # has LANDED (age ≥ readback_lag_s) — per-step transfers would pay
        # a full RPC round trip each (see _TelemetryBatch).  With
        # readback_lag_s == 0 (CPU: reads are free) close EVERY dispatch so
        # resolution really is the depth-1 cadence the docstring promises.
        if not self.defer_readback:
            close_at = 1 if self.readback_lag_s == 0 else self.max_inflight
            if sum(1 for e in self._pending if e.batch is None) >= close_at:
                self._close_batch()

        # dispatch-time anchor history (no readback): the corrected state's
        # DEVICE ref enters the re-deskew anchor list the moment the step is
        # enqueued; controls = first IMU after t2 (host buffers lead t2 by
        # real_time_delay, so it exists)
        if advanced:
            nxt2 = self.accum.get_next_imu(t2)
            self._anchors_d.append(AnchorRec(
                t2, out.x,
                nxt2.a if nxt2 is not None else anchor_a,
                nxt2.w if nxt2 is not None else anchor_w,
            ))
            horizon = t2 - 2 * max(cfg.full_rotation_time, 0.2)
            self._anchors_d = ([a for a in self._anchors_d if a.t >= horizon]
                               or self._anchors_d[-1:])

        # Step 2 (offline mode): map every full rotation with final states
        # (main.cpp:107-117, Mapper::hasToMap).  Triggered at DISPATCH time
        # from the dispatch-cadence anchor history — no resolution (and so
        # no device→host readback) is ever needed for the mapping cadence.
        # Mode "none" (frozen HD map) never maps.
        if (
            cfg.mapping_mode == "offline"
            and self.last_map_time is not None
            and t2 - self.last_map_time >= cfg.full_rotation_time
        ):
            if self._anchors_d:
                self._offline_map(t2, rebase)
                self.last_map_time = t2

        # Step 3: GC (main.cpp:122) — time-based, needs no device values
        self.accum.clear_lidar(t2 - cfg.empty_lidar_time)
        self.accum.clear_imus(min(self.anchor_t, self.last_time_integrated) - 1.0)
        return None

    # ------------------------------------------------------------------
    def _close_batch(self) -> Optional[_TelemetryBatch]:
        """Stack the unbatched pending steps' telemetry into ONE device
        buffer (non-donated copy — later donated steps must not overwrite
        it) and start its async host copy."""
        open_entries = [e for e in self._pending if e.batch is None]
        if not open_entries:
            return None
        # chunk to a FIXED stack width so _stack_telemetry compiles once per
        # max_inflight (a deferred flush would otherwise compile a fresh
        # executable per run-length — minutes each through the TPU tunnel);
        # short chunks pad by repeating the last entry (extra rows unused)
        batch = None
        K = self.max_inflight
        for c0 in range(0, len(open_entries), K):
            chunk = open_entries[c0:c0 + K]
            tels = [e.tel for e in chunk] + [chunk[-1].tel] * (K - len(chunk))
            with self.timers("close_batch"):
                stacked = _stack_telemetry(tels)
            batch = _TelemetryBatch(stacked, _time.perf_counter())
            for i, e in enumerate(chunk):
                e.batch = batch
                e.row = i
        return batch

    def _resolve_ready(self) -> None:
        """Resolve every pending step whose telemetry batch is READABLE
        without waiting on device work: its compute has landed
        (`fetch.is_ready()` — the exact signal) or it is already cached
        host-side.  Age-gated reads (the r4 design) blocked ~135 ms each on
        the queued device work in faster-than-real-time replays — the r4
        "33× wall gap" (BENCH.md r05).  A hard age ceiling still forces a
        blocking read so live consumers' record latency stays bounded."""
        # lag == 0 (CPU): reads are free — resolve immediately, the exact
        # depth-1 cadence (blocking on not-yet-ready compute is fine there)
        ceiling = max(10.0 * self.readback_lag_s, 0.5) if self.readback_lag_s else 0.0
        while self._pending:
            b = self._pending[0].batch
            if b is None:
                return
            age = _time.perf_counter() - b.dispatched_at
            if b._host is None and not b.fetch.is_ready() and age < ceiling:
                return
            self._resolve_one()

    def _resolve_all(self) -> Optional[StepRecord]:
        """Drain the pending queue (flush): wait the youngest batch's compute
        out once, then read each batch back with one blocking device_get."""
        rec = None
        if self._pending:
            batch = self._close_batch() or self._pending[-1].batch
            with self.timers("flush_wait"):
                jax.block_until_ready(batch.fetch)
        while self._pending:
            rec = self._resolve_one()
        return rec

    def _resolve_one(self) -> Optional[StepRecord]:
        """Finish the host bookkeeping of the OLDEST dispatched step: update
        cadence/time bookkeeping, offline mapping, record append, publishing."""
        if not self._pending:
            return None
        if self._pending[0].batch is None:
            self._close_batch()   # forced early (flush/horizon/shape change)
        pending = self._pending.popleft()
        with self.timers("tele_read"):
            tele = pending.batch.row(pending.row)
        with self.timers("resolve_host"):
            return self._resolve_entry(pending, tele)

    def _resolve_entry(self, pending, tele) -> Optional[StepRecord]:
        (t2, rebase, out, anchor_a, anchor_w, wall_dispatch_ms, win_int) = (
            pending.t2, pending.rebase, pending.out, pending.anchor_a,
            pending.anchor_w, pending.wall_dispatch_ms, pending.win_int)
        cfg = self.config
        wall0 = _time.perf_counter()

        from ..step import (TEL_ANCHOR_T, TEL_DELTA_NORM, TEL_DS_COUNT,
                            TEL_EIG, TEL_EXT_R, TEL_EXT_T, TEL_ITERS,
                            TEL_MAP_BUCKETS, TEL_MAP_DROPPED, TEL_MAP_POINTS,
                            TEL_MATCHES, TEL_P, TEL_R, TEL_RESIDUAL,
                            TEL_UPDATED, TEL_V)

        updated = bool(tele[TEL_UPDATED] > 0.5)
        if pending.advanced and not updated:
            # raw count cleared MAX_POINTS2MATCH but the voxel downsample
            # collapsed the window below it — those points were consumed
            # without the reference's retry (see the optimistic advance in
            # step_window); count it so the deviation is observable
            self.collapsed_windows += 1
            # the optimistic anchor-bound advance (step_window) was wrong for
            # this window: roll back to the device truth (≤ optimistic — a
            # LOWER bound is always safe, it only widens future windows)
            if tele[TEL_ANCHOR_T] >= 0.0:
                self.anchor_t = rebase + float(tele[TEL_ANCHOR_T])
        ds_count, n_matches = tele[TEL_DS_COUNT], tele[TEL_MATCHES]
        mean_res, iters = tele[TEL_RESIDUAL], tele[TEL_ITERS]
        R_h = tele[TEL_R].reshape(3, 3)
        p_h, v_h = tele[TEL_P], tele[TEL_V]
        # refresh the host's anchor-time lower bound from the device's truth
        # (the device anchor itself advanced at dispatch — see step_window)
        if (tele[TEL_ANCHOR_T] >= 0.0
                and not (pending.advanced and not updated)):
            self.anchor_t = max(self.anchor_t, rebase + float(tele[TEL_ANCHOR_T]))
        if updated:
            # corrected state enters the state history (BUFFER_X push);
            # monotonic — see the optimistic advance in step_window
            self.last_time_updated = max(self.last_time_updated, t2)
            nxt = self.accum.get_next_imu(t2)
            self._anchors.append(AnchorRec(
                t2, out.x,
                nxt.a if nxt is not None else anchor_a,
                nxt.w if nxt is not None else anchor_w,
                np.asarray(R_h), np.asarray(p_h),
            ))
            horizon = t2 - 2 * max(cfg.full_rotation_time, 0.2)
            self._anchors = [a for a in self._anchors if a[0] >= horizon] or self._anchors[-1:]
            if self.last_map_time is None:
                self.last_map_time = t2

        # map lifecycle: forget buckets beyond map_prune_radius of the pose
        # (bounded memory on long trajectories — the reference never does
        # this and grows without bound, SURVEY.md §5 long-context row)
        if cfg.map_prune_radius > 0 and updated:
            if self._last_prune_t is None:
                self._last_prune_t = t2
            elif t2 - self._last_prune_t >= cfg.map_prune_every:
                self.map = prune(
                    self.map, jnp.asarray(p_h, jnp.float32),
                    jnp.float32(cfg.map_prune_radius), self.grid,
                )
                self._last_prune_t = t2

        rec = StepRecord(
            t=t2,
            R=np.asarray(R_h),
            p=np.asarray(p_h),
            v=np.asarray(v_h),
            updated=updated,
            ds_count=int(ds_count),
            num_matches=int(n_matches),
            mean_residual=float(mean_res),
            iterations=int(iters),
            wall_ms=wall_dispatch_ms + (_time.perf_counter() - wall0) * 1e3,
            eigenvalues=np.asarray(tele[TEL_EIG]),
            extr_rotvec=np.asarray(tele[TEL_EXT_R]),
            extr_t=np.asarray(tele[TEL_EXT_T]),
            map_points=int(tele[TEL_MAP_POINTS]),
            map_buckets=int(tele[TEL_MAP_BUCKETS]),
            map_dropped=int(tele[TEL_MAP_DROPPED]),
            delta_norm=float(tele[TEL_DELTA_NORM]),
        )
        if updated:
            self._result.records.append(rec)
            # keep device handles; materialize lazily (pulling the full cloud
            # every step costs a host↔device round trip it rarely needs)
            self._last_gpts_dev = (out.global_pts, out.global_mask)
            self._last_gds_dev = (out.global_ds, out.global_ds_mask)
            self._last_gds_idx_dev = out.global_ds_idx
            self._last_win_int = win_int
            if self.publisher is not None:
                # publish.state + tf (main.cpp:87-88)
                self.publisher.state(rec)
                if cfg.print_extrinsics:
                    self.publisher.extrinsics(rec)
                # window cloud /limovelo/pcl = the downsampled localize cloud
                # (main.cpp:92-93).  Pulls are gated on attached sinks — each
                # is a full (N,3) readback.
                if getattr(self.publisher, "on_cloud", None):
                    g, inten = self._last_gds_i
                    self.publisher.cloud(g, t2, intensity=inten)
                # map stream /limovelo/full_pcl, online branch
                # (main.cpp:101-105): full-res when high_quality_publish
                if cfg.mapping_mode == "online" and getattr(self.publisher, "on_full_cloud", None):
                    g, inten = (self._last_gpts_i if cfg.high_quality_publish
                                else self._last_gds_i)
                    self.publisher.full_cloud(g, t2, intensity=inten)
                if getattr(self.publisher, "wants_planes", False):
                    # /limovelo/planes analog — pulled only when subscribed
                    cen, nrm, pv = jax.device_get(
                        (out.diag.plane_centroids, out.diag.plane_normals,
                         out.diag.plane_valid)
                    )
                    self.publisher.planes(cen[pv], nrm[pv], t2)
                if getattr(self.publisher, "on_states", None):
                    # /limovelo/states analog — the BUFFER_X pose array.
                    # Host pose copies ride in each AnchorRec, so this pull
                    # costs zero device reads; device_get only for legacy
                    # checkpoint-restored entries lacking them.
                    ts = np.array([a.t for a in self._anchors])
                    Rs, ps = [], []
                    for a in self._anchors:
                        if a.R_h is not None:
                            Rs.append(a.R_h); ps.append(a.p_h)
                        else:
                            Rh, ph = jax.device_get((a.x.R, a.x.p))
                            Rs.append(np.asarray(Rh)); ps.append(np.asarray(ph))
                    self.publisher.states(ts, np.stack(ps), np.stack(Rs), t2)
            self._on_record(rec)
        return rec

    def _on_record(self, rec: StepRecord) -> None:
        """Hook: called once per accepted update, after record/publishing,
        while `self.x` / `_last_gpts_dev` still belong to that step (the
        SLAM layer keyframes here)."""

    def flush(self) -> Optional[StepRecord]:
        """Resolve all in-flight steps (public: call before reading `result`
        mid-run or checkpointing)."""
        return self._resolve_all()

    def _quiesce(self) -> None:
        """Wait the device idle WITHOUT reading anything back — called
        before a dispatch that will compile a NEW executable (see
        step_window).  r4 drained the queue here via resolution, but each
        resolution is a device→host read and ONE read flips the tunneled
        runtime into the ~140×-slower degraded execution mode (BENCH.md
        r05) — a shape change early in a replay was silently poisoning the
        whole run.  Compile-safety only needs the in-flight donated
        executions finished, which block_until_ready provides read-free."""
        tail = self._pending[-1].out.x if self._pending else self.x
        if tail is not None:
            jax.block_until_ready(tail)

    # ------------------------------------------------------------------
    @property
    def _last_gpts(self):
        """Latest global-frame window (full res), materialized on demand."""
        dev = getattr(self, "_last_gpts_dev", None)
        if dev is None:
            return None
        g, msk = jax.device_get(dev)
        return g[msk]

    @property
    def _last_gds(self):
        """Latest global-frame downsampled window, materialized on demand."""
        dev = getattr(self, "_last_gds_dev", None)
        if dev is None:
            return None
        g, msk = jax.device_get(dev)
        return g[msk]

    @property
    def _last_gpts_i(self):
        """(full-res window, per-point intensity) — the full cloud keeps the
        window's own order, so intensity aligns by the window mask."""
        dev = getattr(self, "_last_gpts_dev", None)
        if dev is None:
            return None, None
        g, msk = jax.device_get(dev)
        win_int = getattr(self, "_last_win_int", None)
        return g[msk], (win_int[msk] if win_int is not None else None)

    @property
    def _last_gds_i(self):
        """(downsampled window, per-point intensity) — gathered through the
        medoid selection indices (ops/voxel Downsampled.idx)."""
        dev = getattr(self, "_last_gds_dev", None)
        if dev is None:
            return None, None
        idx_dev = getattr(self, "_last_gds_idx_dev", None)
        g, msk, idx = jax.device_get((dev[0], dev[1], idx_dev))
        win_int = getattr(self, "_last_win_int", None)
        inten = win_int[idx[msk]] if (win_int is not None and idx is not None) else None
        return g[msk], inten

    # ------------------------------------------------------------------
    def _offline_map(self, t2: float, rebase: float):
        """Re-deskew [t2 − full_rotation_time, t2] with the final states,
        insert the downsampled global cloud, and publish the map stream
        (offline mapping branch, main.cpp:107-117: full-resolution cloud when
        `high_quality_publish`, downsampled otherwise)."""
        cfg = self.config
        t_lo = t2 - cfg.full_rotation_time
        pts, pts_t, pts_i = self.accum.get_points(t_lo, t2)
        if len(pts) == 0:
            return
        bucket = cfg.bucket_for(len(pts), cfg.point_buckets)
        if len(pts) > bucket:
            pts, pts_t, pts_i = pts[-bucket:], pts_t[-bucket:], pts_i[-bucket:]
        n = len(pts)
        pts_pad = np.zeros((bucket, 3), np.float32)
        t_pad = np.zeros(bucket, np.float32)
        mask = np.zeros(bucket, bool)
        int_pad = np.zeros(bucket, np.float32)
        pts_pad[:n] = pts
        t_pad[:n] = (pts_t - rebase).astype(np.float32)
        mask[:n] = True
        int_pad[:n] = pts_i

        # oldest stored anchor at/before t_lo (fall back to the oldest kept);
        # dispatch-cadence history — device refs, never resolved
        older = [a for a in self._anchors_d if a.t <= t_lo]
        a_t, a_x, a_a, a_w = (older[-1] if older else self._anchors_d[0])[:4]
        imus = self._pad_imus(*self.accum.get_imus(a_t, t2), t2, rebase)
        sig = ("map", bucket, int(imus.t.shape[0]))
        if sig not in self._seen_shapes:
            self._seen_shapes.add(sig)
            self._quiesce()
        m_new, g_full, g_mask, g_ds, ds_mask, ds_idx = mapping_step(
            self.map, a_x, jnp.float32(a_t - rebase), jnp.asarray(a_a),
            jnp.asarray(a_w), imus, self.x, jnp.float32(t2 - rebase),
            jnp.asarray(pts_pad), jnp.asarray(t_pad), jnp.asarray(mask),
            self.dyn, self._static, self.grid,
        )
        self.map = m_new
        if self.publisher is not None and getattr(self.publisher, "on_full_cloud", None):
            if cfg.high_quality_publish:
                g, msk = jax.device_get((g_full, g_mask))
                inten = int_pad[msk]
            else:
                g, msk, idx = jax.device_get((g_ds, ds_mask, ds_idx))
                inten = int_pad[idx[msk]]
            self.publisher.full_cloud(g[msk], t2, intensity=inten)

    # ------------------------------------------------------------------
    def spin_once(self) -> bool:
        """One main-loop pass; returns True if a window was processed."""
        cfg = self.config
        # resolve any steps whose telemetry has landed: their readbacks have
        # been in flight since dispatch; the anchor itself is threaded on
        # device, so scheduling never blocks on them
        self._resolve_ready()
        if not self.accum.ready():
            return False
        # stream-death detector (Accumulator::ended, Accumulator.cpp:117-122
        # — defined but never consumed by the reference loop; here it
        # terminates cleanly instead of spinning forever on a dead feed)
        if self.accum.ended(self.accum.newest_data_time()):
            if not self.stream_dead:
                self.stream_dead = True
                import logging

                logging.getLogger(__name__).error(
                    "Sensor stream appears dead (<2 IMUs in the last 3 s); "
                    "stopping the localization loop."
                )
                self.flush()
            return False
        elif self.stream_dead:
            self.stream_dead = False   # stream recovered
        if not self._initialized:
            self._initialize()

        latest = self.accum.latest_time()
        if cfg.real_time:
            t2 = latest
        else:
            delta_prev = self.accum.update_delta(self.t2)
            t2 = min(self.t2 + delta_prev, latest)
        delta = self.accum.update_delta(t2)
        t1 = max(t2 - delta, self.last_time_updated)
        # t2 advances even when the window is skipped (main.cpp keeps the
        # mutated t2 across the break at main.cpp:71)
        self.t2 = t2
        if t2 - t1 < delta - 1e-6:
            return False
        # never reprocess an already-attempted window: the reference attempts
        # at most one window per incoming message (the `break` at the end of
        # the while(ready()) body, main.cpp:125); without new data we stop
        if t2 <= self._last_processed_t2 + 1e-9:
            return False
        self._last_processed_t2 = t2
        self.step_window(t1, t2)
        return True

    def spin(self, max_steps: int = 10 ** 9) -> int:
        # NOTE: no flush here — the freshly dispatched step's readback keeps
        # landing while the caller ingests more data; `result` (property) and
        # checkpointing flush on access
        steps = 0
        while steps < max_steps and self.spin_once():
            steps += 1
        return steps
