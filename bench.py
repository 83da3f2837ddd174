"""Benchmark: kernel-level step rate AND pipeline-level scans/s on one chip.

MEASUREMENT PROTOCOL (r04 — see BENCH.md "readback pathology"):
on the tunneled TPU runtime this targets, the FIRST device→host readback of
ANY buffer flips the process into a degraded-dispatch mode (~26 ms blocking
round trip per dispatch; enqueue throughput survives at ~1.5 ms/step) — and
after a HEAVY session (hundreds of dispatches, large map builds) the first
readback can ABORT the tunnel session outright.  r03's bench read one
telemetry value between compile and its timed loop and thereby destroyed
its own measurement (19 Hz recorded vs the ~5000 Hz the step actually runs
at).  This bench therefore runs THREE ISOLATED SUBPROCESSES:

  kernel    pure timing: full-step p50 at both KNN envelopes + a known-bytes
            calibration gather.  ZERO device→host reads — the numbers
            cannot be poisoned and survive any later abort.
  detail    a light session: one step's matches/ds_count, the measured cost
            of the first readback and of poisoned blocking dispatch, and
            the sparse-map rings-fidelity comparison (match counts + recall
            vs an exact oracle).
  pipeline  deterministic sim replay through the production `LioPipeline`
            (depth-K async readback): updates/s and scans/s of wall time
            with per-step telemetry still flowing.

The parent merges the sections and prints the driver JSON.  A section that
dies (tunnel abort) contributes nulls instead of killing the record.

Driver contract: the LAST line printed is ONE JSON object with
{"metric", "value", "unit", "vs_baseline"} (plus informational extras).
Baseline: the reference's headline 100 Hz localization rate (delta=0.01 s,
/root/reference/README.md:13-15, BASELINE.md).  vs_baseline = achieved_hz/100.
"""

import json
import os
import subprocess
import sys
import time

import numpy as np

SECTION_TAG = "__bench_section__"


def _base_cfg_kwargs():
    return dict(
        real_time=True,
        min_dist=0.5,
        downsample_prec=0.5,
        map_table_size=1 << 17,
    )


def _build_map(grid, insert, make_map, jnp, rng, n_map=200_000):
    m = make_map(grid)
    ground = np.stack(
        [rng.uniform(-60, 60, n_map // 2), rng.uniform(-60, 60, n_map // 2),
         rng.normal(0, 0.02, n_map // 2)], axis=1
    )
    walls = np.stack(
        [rng.uniform(-60, 60, n_map // 2),
         np.where(rng.random(n_map // 2) < 0.5, -6.0, 6.0) + rng.normal(0, 0.02, n_map // 2),
         rng.uniform(0, 4, n_map // 2)], axis=1
    )
    map_pts = np.concatenate([ground, walls]).astype(np.float32)
    for i in range(0, n_map, 16384):
        chunk = map_pts[i: i + 16384]
        pad = np.zeros((16384, 3), np.float32)
        pad[: len(chunk)] = chunk
        msk = np.zeros(16384, bool)
        msk[: len(chunk)] = True
        m = insert(m, jnp.asarray(pad), jnp.asarray(msk), grid)
    return m


def _make_step(config, n_pts=2048, n_imu=16, window_s=0.01):
    """Build inputs + compiled step for one kernel config.  NO readbacks."""
    import jax
    import jax.numpy as jnp

    from limovelo_tpu.config import DynParams
    from limovelo_tpu.filter.process import ImuWindow, process_noise_Q
    from limovelo_tpu.geometry import state as st
    from limovelo_tpu.mapping import GridParams, insert, make_map
    from limovelo_tpu.step import StepInputs, lio_step

    grid = GridParams.from_config(config)
    rng = np.random.default_rng(0)
    m = _build_map(grid, insert, make_map, jnp, rng)
    x = st.make_initial(config)
    x = st.boxplus(x, jnp.asarray(np.r_[0.0, 0.0, 1.5, np.zeros(20)], jnp.float32))
    P = st.initial_covariance()
    az = rng.uniform(0, 2 * np.pi, n_pts)
    elev = np.deg2rad(rng.uniform(-15, 15, n_pts))
    r = rng.uniform(3, 40, n_pts)
    pts = np.stack(
        [np.cos(elev) * np.cos(az) * r, np.cos(elev) * np.sin(az) * r, -1.5 + 0.0 * r],
        axis=1,
    ).astype(np.float32)
    ts = ((np.arange(n_imu) + 1) * (window_s / n_imu)).astype(np.float32)
    imus = ImuWindow(
        t=jnp.asarray(ts),
        a=jnp.asarray(np.tile(-np.array(config.gravity_vec, np.float32), (n_imu, 1))),
        w=jnp.zeros((n_imu, 3), jnp.float32),
        mask=jnp.ones(n_imu, bool),
    )
    inp = StepInputs(
        anchor=x, anchor_t=jnp.float32(0.0),
        anchor_a=jnp.asarray(-np.array(config.gravity_vec, np.float32)),
        anchor_w=jnp.zeros(3, jnp.float32),
        x=x, P=P, t_integrated=jnp.float32(0.0),
        imus_filter=imus, imus_path=imus,
        pts=jnp.asarray(pts),
        pts_t=jnp.asarray(rng.uniform(0, window_s, n_pts).astype(np.float32)),
        pts_mask=jnp.ones(n_pts, bool),
        t2=jnp.float32(window_s),
        Q=process_noise_Q(config),
        dyn=DynParams.from_config(config),
    )
    static_cfg = config.static()
    out = lio_step(inp, m, static_cfg, grid)   # compile (no readback)
    jax.block_until_ready(out.x)
    return dict(inp=inp, m=out.map, static=static_cfg, grid=grid, out0=out)


def _time_step(ctx, n_reps=50):
    """Timed loop — block_until_ready only, zero device→host transfers."""
    import jax

    from limovelo_tpu.step import lio_step

    inp, m = ctx["inp"], ctx["m"]
    lat = []
    out = None
    for _ in range(n_reps):
        t0 = time.perf_counter()
        out = lio_step(inp, m, ctx["static"], ctx["grid"])
        jax.block_until_ready(out.x)
        lat.append(time.perf_counter() - t0)
        m = out.map
    ctx["m"] = m
    ctx["out_last"] = out
    return float(np.percentile(lat, 50))


# ---------------------------------------------------------------------------
# sections (each runs in its own process)
# ---------------------------------------------------------------------------


def sec_kernel():
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from limovelo_tpu import Config

    cfg_prod = Config(**_base_cfg_kwargs())
    cfg_r1 = Config(**_base_cfg_kwargs(), knn_rings=1)
    ctx_prod = _make_step(cfg_prod)
    ctx_r1 = _make_step(cfg_r1)
    static_prod = ctx_prod["static"]
    mb = static_prod.knn_max_buckets or (2 * static_prod.knn_rings + 1) ** 3
    slots = ctx_prod["grid"].slots

    # calibration gather: same access pattern as the KNN slot gather
    T = 1 << 17
    nq = 2048
    table = jnp.asarray(np.random.default_rng(1).normal(
        size=(T, slots, 3)).astype(np.float32))
    gidx = jnp.asarray(np.random.default_rng(2).integers(
        0, T, size=(nq, mb)).astype(np.int32))

    @jax.jit
    def gather_probe(tb, ix):
        return tb[ix].sum(axis=(1, 2, 3))

    jax.block_until_ready(gather_probe(table, gidx))
    probe_bytes = nq * mb * slots * 3 * 4

    p50_prod = _time_step(ctx_prod)
    print(f"[kernel] production rings={static_prod.knn_rings} "
          f"(max_buckets={mb}): p50={p50_prod*1e3:.3f} ms  "
          f"{1.0/p50_prod:.0f} Hz", flush=True)
    p50_r1 = _time_step(ctx_r1)
    print(f"[kernel] rings=1 (27-bucket, exact to 0.8 m):  "
          f"p50={p50_r1*1e3:.3f} ms  {1.0/p50_r1:.0f} Hz", flush=True)
    delta_pct = (p50_prod / p50_r1 - 1) * 100
    print(f"[kernel] full-gate KNN coverage costs "
          f"{delta_pct:+.1f}% step latency on the dense scene "
          f"(within run-to-run noise when ~0; see [fidelity] for what the "
          f"coverage buys)")
    # scans/s per chip: a FULL-ROTATION window (0.1 s of data at Velodyne
    # scale: ~32k pts/rotation ÷ downsample_rate 4 ≈ 8k raw points, 40 IMU
    # samples at 400 Hz).  The C++ baseline proxy: the reference consumes
    # 10 Hz rotations in real time on one core with downsample_rate=4
    # (README.md:70-77) ⇒ ~10-20 scans/s single-core; BASELINE.md targets
    # ≥10× that per chip.
    ctx_scan = _make_step(cfg_prod, n_pts=8192, n_imu=64, window_s=0.1)
    p50_scan = _time_step(ctx_scan, n_reps=30)
    scans_s = 1.0 / p50_scan
    print(f"[kernel] full-rotation window (8192 raw pts, 0.1 s): "
          f"p50={p50_scan*1e3:.3f} ms -> {scans_s:.0f} scans/s/chip "
          f"(C++ baseline proxy ~15 scans/s single core -> "
          f"{scans_s/15.0:.0f}x)", flush=True)
    glat = []
    for _ in range(30):
        t0 = time.perf_counter()
        jax.block_until_ready(gather_probe(table, gidx))
        glat.append(time.perf_counter() - t0)
    p50_gather = float(np.percentile(glat, 50))
    probe_gbps = probe_bytes / p50_gather / 1e9
    print(f"[kernel] calibration gather: {probe_bytes/1e6:.0f} MB in "
          f"{p50_gather*1e3:.3f} ms = {probe_gbps:.0f} GB/s achievable "
          f"(v5e nominal HBM 819 GB/s)", flush=True)
    return {
        "p50_prod_ms": p50_prod * 1e3,
        "p50_r1_ms": p50_r1 * 1e3,
        "gather_probe_gbps": probe_gbps,
        "mb": mb,
        "slots": slots,
        "match_mode": getattr(static_prod, "match_mode", "rematch"),
        "scans_per_s_chip": scans_s,
        "p50_scan_ms": p50_scan * 1e3,
    }


def sec_detail():
    """Light session: matches/ds_count, readback costs, sparse fidelity."""
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from limovelo_tpu import Config
    from limovelo_tpu.mapping import GridParams, insert, knn, make_map
    from limovelo_tpu.step import TEL_DS_COUNT, TEL_MATCHES, lio_step

    cfg = Config(**_base_cfg_kwargs())
    ctx = _make_step(cfg)
    t0 = time.perf_counter()
    tele = np.asarray(ctx["out0"].telemetry)       # FIRST readback (poisons)
    first_read_ms = (time.perf_counter() - t0) * 1e3
    matches = int(tele[TEL_MATCHES])
    ds_count = max(int(tele[TEL_DS_COUNT]), 1)
    plat = []
    for _ in range(10):
        t0 = time.perf_counter()
        out = lio_step(ctx["inp"], ctx["m"], ctx["static"], ctx["grid"])
        jax.block_until_ready(out.x)
        plat.append(time.perf_counter() - t0)
        ctx["m"] = out.map
    p50_poisoned = float(np.percentile(plat, 50))
    print(f"[detail] production matches={matches} ds_count={ds_count}")
    print(f"[readback] first device->host read: {first_read_ms:.1f} ms; "
          f"blocking dispatch after it: p50={p50_poisoned*1e3:.2f} ms "
          f"(the degraded mode — r03 recorded THIS number; the pipeline "
          f"sidesteps it entirely with defer-readback streaming, r5)",
          flush=True)

    # sparse-map rings fidelity
    grid = GridParams.from_config(cfg)
    static = cfg.static()
    rng = np.random.default_rng(3)
    n_map = 4096
    mp = np.stack([rng.uniform(-40, 40, n_map), rng.uniform(-40, 40, n_map),
                   rng.normal(0, 1.0, n_map)], axis=1).astype(np.float32)
    m = insert(make_map(grid), jnp.asarray(mp), jnp.ones(n_map, bool), grid)
    nq = 1024
    q = np.stack([rng.uniform(-30, 30, nq), rng.uniform(-30, 30, nq),
                  rng.normal(0, 1.0, nq)], axis=1).astype(np.float32)
    res = {}
    for tag, rings, mb in (("rings1", 1, None),
                           ("prod", static.knn_rings, static.knn_max_buckets)):
        nb, sq, valid = knn(m, jnp.asarray(q), grid, k=static.NUM_MATCH_POINTS,
                            rings=rings, max_buckets=mb)
        res[tag] = (np.asarray(sq), np.asarray(valid))
    gate = cfg.MAX_DIST_PLANE
    d2 = ((q[:, None, :] - mp[None, :, :]) ** 2).sum(-1)
    k = static.NUM_MATCH_POINTS
    od2 = np.take_along_axis(d2, np.argsort(d2, axis=1)[:, :k], axis=1)
    oracle_valid = od2 <= gate * gate
    fid = {"oracle_pairs": int(oracle_valid.sum())}
    for tag in ("rings1", "prod"):
        sq, valid = res[tag]
        within = valid & (sq <= gate * gate)
        fid[tag + "_pairs"] = int(within.sum())
        hits = 0
        for i in range(nq):
            got = np.sort(sq[i][within[i]])
            want = np.sort(od2[i][oracle_valid[i]])
            j = 0
            for wv in want:
                while j < len(got) and got[j] < wv - 1e-4:
                    j += 1
                if j < len(got) and abs(got[j] - wv) <= 1e-4:
                    hits += 1
                    j += 1
        fid[tag + "_recall"] = hits / max(fid["oracle_pairs"], 1)
    print(f"[fidelity] sparse map ({fid['oracle_pairs']} oracle pairs <= "
          f"MAX_DIST_PLANE): rings=1 -> {fid['rings1_pairs']} matches, "
          f"recall {fid['rings1_recall']*100:.1f}%; production -> "
          f"{fid['prod_pairs']} matches, recall {fid['prod_recall']*100:.1f}%",
          flush=True)
    return {
        "matches": matches, "ds_count": ds_count,
        "first_readback_ms": first_read_ms,
        "poisoned_dispatch_ms": p50_poisoned * 1e3,
        "sparse_recall_rings1": fid["rings1_recall"],
        "sparse_recall_prod": fid["prod_recall"],
    }


def sec_pipeline():
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    from limovelo_tpu import Config
    from limovelo_tpu.io.simulate import (circle_trajectory, replay_into,
                                          room_world, simulate)
    from limovelo_tpu.mapping import GridParams
    from limovelo_tpu.runtime.pipeline import LioPipeline

    config = Config(
        real_time=False, min_dist=0.5, downsample_prec=0.3,
        full_rotation_time=0.1, imu_rate=200.0, real_time_delay=0.1,
        empty_lidar_time=0.5, degeneracy_threshold=0.0,
        covariance_acceleration=1e-2, covariance_gyroscope=1e-3,
        point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
        imu_buckets=(64,), map_table_size=1 << 14,
    )
    import jax

    traj = circle_trajectory(radius=4.0, omega=0.4)
    world = room_world(size=24.0, n_boxes=10)
    sim = simulate(world, traj, config, duration=5.0, lidar_lines=12,
                   pts_per_line=180, imu_rate=200.0, seed=7)
    from limovelo_tpu.config import InitializationParams

    # the 100 Hz config mirrors tests/test_racing.test_100hz_localization_mode
    # (full racing-turn envelope; warm-up starts at a full rotation and
    # finishes shrinking after the launch ramp — measured r5)
    hz100 = Config(
        real_time=True, min_dist=0.5, downsample_prec=0.4,
        full_rotation_time=0.1, imu_rate=400.0, real_time_delay=0.1,
        empty_lidar_time=0.5, degeneracy_threshold=0.0,
        covariance_acceleration=1e-2, covariance_gyroscope=1e-3,
        point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
        imu_buckets=(64, 128), map_table_size=1 << 15,
        Initialization=InitializationParams(times=(0.5, 1.0, 1.5),
                                            deltas=(0.1, 0.05, 0.02, 0.01)),
    )
    om100 = np.deg2rad(100.0)
    traj100 = circle_trajectory(radius=20.0 / om100, omega=om100, ramp=1.5,
                                hold=0.5)
    world100 = room_world(size=56.0, n_boxes=16, seed=4)
    sim100 = simulate(world100, traj100, hz100, duration=6.0, lidar_lines=12,
                      pts_per_line=220, imu_rate=400.0, seed=22)

    # cold replays compile every (bucket, config) executable — deliberately
    # NO flush anywhere until BOTH timed streams are done: the first
    # device→host read flips this process into the degraded mode where the
    # step PROGRAM executes at ~28 ms instead of ~0.2 ms (r5 probe_realstep,
    # BENCH.md) — r4's bench poisoned its own timed replay exactly this way
    pipe = LioPipeline(config, grid=GridParams.from_config(config))
    replay_into(pipe, sim)
    jax.block_until_ready(pipe.x)
    pipeh = LioPipeline(hz100, grid=GridParams.from_config(hz100))
    replay_into(pipeh, sim100, spin_every_imu=True)
    jax.block_until_ready(pipeh.x)

    pipe2 = LioPipeline(config, grid=GridParams.from_config(config))
    t0 = time.perf_counter()
    replay_into(pipe2, sim)
    jax.block_until_ready(pipe2.x)        # stream fully executed, zero reads
    stream_wall = time.perf_counter() - t0

    pipeh2 = LioPipeline(hz100, grid=GridParams.from_config(hz100))
    t0h = time.perf_counter()
    replay_into(pipeh2, sim100, spin_every_imu=True)
    jax.block_until_ready(pipeh2.x)
    stream100 = time.perf_counter() - t0h

    # first readback after the heavy session: pays the mode flip (tens of
    # seconds on this tunneled runtime — the BENCH.md 'first readback'
    # pathology; the pipeline's slow-readback alarm fires here)
    t0f = time.perf_counter()
    pipe2.flush()
    flush_s = time.perf_counter() - t0f
    wall = stream_wall + flush_s
    recs = pipe2.result.records
    wall_ms = np.array([r.wall_ms for r in recs])
    upd_hz = len(recs) / wall if wall else 0.0
    upd_hz_stream = len(recs) / stream_wall if stream_wall else 0.0
    scans_s = len(sim.scans) / stream_wall if stream_wall else 0.0
    p50 = float(np.percentile(wall_ms, 50)) if len(recs) else None
    mean_ds = float(np.mean([r.ds_count for r in recs])) if recs else 0.0
    print(f"[pipeline] {len(recs)} updates / {len(sim.scans)} scans: "
          f"stream {stream_wall:.2f} s ({upd_hz_stream:.1f} updates/s "
          f"read-free, {scans_s:.1f} scans/s), + first-readback flush "
          f"{flush_s:.1f} s -> {wall:.2f} s total ({upd_hz:.1f} updates/s; "
          f"mean window {mean_ds:.0f} ds-points)", flush=True)
    # stage decomposition (VERDICT r4 weak#1): wall = Σ stages + remainder,
    # remainder = sim feed + spin scheduling + python overhead
    stages = pipe2.timers.summary()
    print("[pipeline stages]")
    print(pipe2.timers.report(), flush=True)
    stage_sum = sum(v["total_ms"] for v in stages.values())
    print(f"[pipeline stages] Σ stages = {stage_sum:.0f} ms of {wall*1e3:.0f} ms "
          f"wall; remainder = {wall*1e3 - stage_sum:.0f} ms "
          f"(sim feed + spin scheduling + python)", flush=True)

    # the reference's headline 100 Hz mode (delta = 0.01 s real-time windows,
    # README.md:13-15) through the production pipeline — VERDICT r4 #4.
    # Streamed read-free above, BEFORE the first flush; its own flush now
    # runs in the already-degraded mode (cheap batch reads, no mode flip).
    t0f = time.perf_counter()
    pipeh2.flush()
    wall100 = stream100 + (time.perf_counter() - t0f)
    recs100 = pipeh2.result.records
    data_span = recs100[-1].t - recs100[0].t if len(recs100) > 1 else 1.0
    hz_data = (len(recs100) - 1) / data_span if len(recs100) > 1 else 0.0
    hz_wall = len(recs100) / wall100 if wall100 else 0.0
    hz_stream = len(recs100) / stream100 if stream100 else 0.0
    rt_factor = data_span / stream100 if stream100 else 0.0
    print(f"[pipeline-100Hz] {len(recs100)} updates over {data_span:.2f} s of "
          f"data: stream {stream100:.2f} s ({hz_stream:.1f} updates/s "
          f"read-free, real-time factor {rt_factor:.2f}x) + flush -> "
          f"{wall100:.2f} s total ({hz_wall:.1f} updates/s; "
          f"{hz_data:.1f} updates/s of DATA time)", flush=True)
    return {
        # headline = read-free steady-state streaming throughput; the
        # *_incl_first_flush variant folds in the ONE-TIME session-end
        # readback (tens of seconds on this tunnel — BENCH.md pathology)
        "pipeline_updates_per_s": upd_hz_stream,
        "pipeline_updates_per_s_incl_first_flush": upd_hz,
        "pipeline_scans_per_s": scans_s,
        "update_wall_p50_ms": p50,
        "stage_totals_ms": {k: round(v["total_ms"], 1) for k, v in stages.items()},
        "stage_sum_ms": round(sum(v["total_ms"] for v in stages.values()), 1),
        "wall_s": round(wall, 3),
        "first_flush_s": round(flush_s, 2),
        "hz100_updates_per_s_data": round(hz_data, 1),
        "hz100_updates_per_s_wall": round(hz_wall, 1),
        "hz100_updates_per_s_stream": round(hz_stream, 1),
        "hz100_rt_factor": round(rt_factor, 3),
    }


# ---------------------------------------------------------------------------
# orchestrator
# ---------------------------------------------------------------------------


def _run_section(name, timeout_s):
    """Run one section in a subprocess; relay its stdout; return its dict."""
    try:
        r = subprocess.run(
            [sys.executable, os.path.abspath(__file__), "--section", name],
            capture_output=True, text=True, timeout=timeout_s,
        )
        for ln in r.stdout.splitlines():
            if ln.startswith(SECTION_TAG):
                continue
            print(ln)
        for ln in r.stdout.splitlines():
            if ln.startswith(SECTION_TAG):
                return json.loads(ln[len(SECTION_TAG):])
        tail = (r.stderr or "").strip().splitlines()
        print(f"[{name}] section died (rc={r.returncode}): "
              f"{tail[-1] if tail else ''}")
    except subprocess.TimeoutExpired:
        print(f"[{name}] section timed out after {timeout_s}s")
    return {}


def main():
    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    if len(sys.argv) > 2 and sys.argv[1] == "--section":
        fn = {"kernel": sec_kernel, "detail": sec_detail,
              "pipeline": sec_pipeline}[sys.argv[2]]
        out = fn()
        print(SECTION_TAG + json.dumps(out), flush=True)
        return

    kern = _run_section("kernel", 3000)
    det = _run_section("detail", 2400)
    pipe = _run_section("pipeline", 3000)

    p50_prod = kern.get("p50_prod_ms")
    hz_prod = 1e3 / p50_prod if p50_prod else 0.0
    hz_r1 = 1e3 / kern["p50_r1_ms"] if kern.get("p50_r1_ms") else None

    # roofline from the ACTUAL match cadence: match_mode="auto" pays ONE
    # KNN slot gather per steady-state step ("rematch": one per GN iter).
    # Bytes/query = max_buckets*slots*12 (xyz f32; no cell_d2 fetch).
    if p50_prod:
        searches = 1 if kern.get("match_mode") == "auto" else 3
        ds_count = det.get("ds_count", 2048)
        gather_bytes = ds_count * kern["mb"] * kern["slots"] * 12 * searches
        gbps = gather_bytes / (p50_prod * 1e-3) / 1e9
        print(f"[roofline] KNN slot gather ~{gather_bytes/1e6:.0f} MB/step "
              f"({searches} search(es)/step at match_mode="
              f"{kern.get('match_mode')!r}, {ds_count} ds-queries) -> "
              f"{gbps:.0f} GB/s at the measured {p50_prod:.3f} ms p50.  "
              f"Calibration: a raw gather of the same pattern achieves "
              f"{kern.get('gather_probe_gbps', float('nan')):.0f} GB/s on "
              f"this chip (v5e nominal HBM 819 GB/s).  MXU work is "
              f"~0.3 MFLOP/step — the step is gather/bandwidth-bound, not "
              f"MXU-bound.")
    else:
        gbps = None

    def _num(x, nd=3):
        try:
            v = round(float(x), nd)
            return v if v == v else None
        except (TypeError, ValueError):
            return None

    print(json.dumps({
        "metric": "lio_update_rate",
        "value": _num(hz_prod, 2) or 0.0,
        "unit": "Hz",
        "vs_baseline": _num(hz_prod / 100.0, 3) or 0.0,
        "kernel_hz_rings1": _num(hz_r1, 2),
        "matches": det.get("matches"),
        "first_readback_ms": _num(det.get("first_readback_ms"), 2),
        "poisoned_dispatch_ms": _num(det.get("poisoned_dispatch_ms"), 3),
        "pipeline_updates_per_s": _num(pipe.get("pipeline_updates_per_s"), 2),
        "pipeline_updates_per_s_incl_first_flush": _num(
            pipe.get("pipeline_updates_per_s_incl_first_flush"), 2),
        "first_flush_s": _num(pipe.get("first_flush_s"), 2),
        "pipeline_scans_per_s": _num(pipe.get("pipeline_scans_per_s"), 2),
        # kernel-level full-rotation-window rate (BASELINE.md ≥10× C++
        # single-core ~15 scans/s; derivation in BENCH.md)
        "scans_per_s_chip": _num(kern.get("scans_per_s_chip"), 1),
        "vs_cpp_scans": _num((kern.get("scans_per_s_chip") or 0) / 15.0, 1),
        "hz100_updates_per_s_data": _num(pipe.get("hz100_updates_per_s_data"), 1),
        "hz100_updates_per_s_wall": _num(pipe.get("hz100_updates_per_s_wall"), 1),
        "hz100_updates_per_s_stream": _num(
            pipe.get("hz100_updates_per_s_stream"), 1),
        "hz100_rt_factor": _num(pipe.get("hz100_rt_factor"), 3),
        "update_wall_p50_ms": _num(pipe.get("update_wall_p50_ms"), 3),
        "sparse_recall_rings1": _num(det.get("sparse_recall_rings1"), 4),
        "sparse_recall_prod": _num(det.get("sparse_recall_prod"), 4),
        "gather_gbps": _num(gbps, 1),
        "gather_probe_gbps": _num(kern.get("gather_probe_gbps"), 1),
    }))


if __name__ == "__main__":
    main()
