"""Benchmark: kernel-level step rate AND pipeline-level scans/s on one chip.

MEASUREMENT PROTOCOL (the r04 fix — see BENCH.md "readback pathology"):
on the tunneled TPU runtime this targets, the FIRST device→host readback of
ANY buffer permanently flips the process into a degraded-dispatch mode
(~26 ms blocking round trip per dispatch; enqueue throughput survives at
~1.5 ms/step).  r03's bench read one telemetry value between compile and its
timed loop and thereby destroyed its own measurement (19 Hz recorded vs the
~4500 Hz the step actually runs at).  This bench therefore:

  1. compiles every executable it will time,
  2. runs ALL timed kernel loops (production rings + rings=1 + a calibration
     gather) with `block_until_ready` only — zero device→host reads,
  3. only THEN reads matches/telemetry (the process is poisoned from that
     point; the poisoned round trip is itself measured and reported),
  4. finally replays the production `LioPipeline` — whose depth-K async
     readback design is built to survive the poisoned mode — and reports
     updates/s with per-step telemetry still flowing.

Sections:
  [kernel]   full-step p50 at BOTH KNN envelopes (production derived-rings
             vs rings=1) on a dense scene.
  [fidelity] rings=1 vs production on a SPARSE map where the envelopes
             actually differ: match counts + recall vs an exact oracle.
  [readback] the measured poisoned round trip — the cost every per-step
             blocking consumer would pay, and what the pipeline amortizes.
  [pipeline] deterministic sim replay through `LioPipeline`: updates/s,
             scans/s of wall time.
  [roofline] bytes/step from the ACTUAL match cadence (match_mode="auto"
             ⇒ 1 KNN gather per steady-state step) against the measured
             step time, calibrated by a timed raw-gather probe.

Driver contract: the LAST line printed is ONE JSON object with
{"metric", "value", "unit", "vs_baseline"} (plus informational extras).
Baseline: the reference's headline 100 Hz localization rate (delta=0.01 s,
/root/reference/README.md:13-15, BASELINE.md).  vs_baseline = achieved_hz/100.
"""

import json
import time

import numpy as np


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


def _make_step(config):
    """Build inputs + compiled closure for one kernel config.  NO readbacks."""
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

    n_pts, n_imu = 2048, 16
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
    ts = ((np.arange(n_imu) + 1) * (0.01 / n_imu)).astype(np.float32)
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
        pts_t=jnp.asarray(rng.uniform(0, 0.01, n_pts).astype(np.float32)),
        pts_mask=jnp.ones(n_pts, bool),
        t2=jnp.float32(0.01),
        Q=process_noise_Q(config),
        dyn=DynParams.from_config(config),
    )
    static_cfg = config.static()
    out = lio_step(inp, m, static_cfg, grid)   # compile (no readback)
    jax.block_until_ready(out.x)
    return dict(inp=inp, m=out.map, static=static_cfg, grid=grid, out0=out)


def _time_step(ctx, n_reps=50):
    """Timed loop — block_until_ready only, zero device→host transfers.
    Returns (p50_s, last_out)."""
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


def _sparse_fidelity(config):
    """rings=1 vs production KNN on a SPARSE map (inter-point spacing beyond
    the 1-ring guarantee) — the envelope difference r03's dense scene hid.
    Returns compiled closures + query/oracle data; all timing-free (called
    after the timed loops, reads allowed)."""
    import jax.numpy as jnp

    from limovelo_tpu.mapping import GridParams, insert, knn, make_map

    grid = GridParams.from_config(config)
    rng = np.random.default_rng(3)
    # sparse scattered landmarks: ~1 pt / (1.5 m)^2 patch so many true
    # neighbors sit 0.8-2.0 m out — covered by derived rings, not by rings=1
    n_map = 4096
    mp = np.stack([
        rng.uniform(-40, 40, n_map), rng.uniform(-40, 40, n_map),
        rng.normal(0, 1.0, n_map),
    ], axis=1).astype(np.float32)
    m = insert(make_map(grid), jnp.asarray(mp), jnp.ones(n_map, bool), grid)

    nq = 1024
    q = np.stack([
        rng.uniform(-30, 30, nq), rng.uniform(-30, 30, nq),
        rng.normal(0, 1.0, nq),
    ], axis=1).astype(np.float32)

    static = config.static()
    out = {}
    for tag, rings, mb in (
        ("rings1", 1, None),
        ("prod", static.knn_rings, static.knn_max_buckets),
    ):
        nb, sq, valid = knn(m, jnp.asarray(q), grid, k=static.NUM_MATCH_POINTS,
                            rings=rings, max_buckets=mb)
        out[tag] = (np.asarray(nb), np.asarray(sq), np.asarray(valid))

    # exact oracle (host): k nearest within MAX_DIST_PLANE
    gate = config.MAX_DIST_PLANE
    d2 = ((q[:, None, :] - mp[None, :, :]) ** 2).sum(-1)
    k = static.NUM_MATCH_POINTS
    idx = np.argsort(d2, axis=1)[:, :k]
    od2 = np.take_along_axis(d2, idx, axis=1)
    oracle_valid = od2 <= gate * gate
    res = {"oracle_pairs": int(oracle_valid.sum())}
    for tag in ("rings1", "prod"):
        nb, sq, valid = out[tag]
        within = valid & (sq <= gate * gate)
        res[tag + "_pairs"] = int(within.sum())
        # recall: fraction of oracle (query, neighbor-distance) pairs the
        # envelope reproduced (distance-set comparison per query)
        hit = 0
        for i in range(nq):
            got = np.sort(sq[i][within[i]])
            want = np.sort(od2[i][oracle_valid[i]])
            j = 0
            for wv in want:
                while j < len(got) and got[j] < wv - 1e-4:
                    j += 1
                if j < len(got) and abs(got[j] - wv) <= 1e-4:
                    hit += 1
                    j += 1
        res[tag + "_recall"] = hit / max(res["oracle_pairs"], 1)
    return res


def _pipeline_bench(config):
    """Deterministic sim replay through the production LioPipeline host loop."""
    from limovelo_tpu.io.simulate import circle_trajectory, replay_into, room_world, simulate
    from limovelo_tpu.mapping import GridParams
    from limovelo_tpu.runtime.pipeline import LioPipeline

    traj = circle_trajectory(radius=4.0, omega=0.4)
    world = room_world(size=24.0, n_boxes=10)
    sim = simulate(world, traj, config, duration=5.0, lidar_lines=12,
                   pts_per_line=180, imu_rate=200.0, seed=7)
    pipe = LioPipeline(config, grid=GridParams.from_config(config))
    # cold run to compile every (bucket, config) executable, then timed run
    replay_into(pipe, sim)
    pipe.flush()
    pipe2 = LioPipeline(config, grid=GridParams.from_config(config))
    t0 = time.perf_counter()
    replay_into(pipe2, sim)
    pipe2.flush()
    wall = time.perf_counter() - t0
    recs = pipe2.result.records
    wall_ms = np.array([r.wall_ms for r in recs])
    return {
        "updates": len(recs),
        "scans": len(sim.scans),
        "wall_s": wall,
        "update_wall_p50_ms": float(np.percentile(wall_ms, 50)) if len(recs) else None,
        "mean_ds": float(np.mean([r.ds_count for r in recs])) if recs else 0.0,
    }


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from limovelo_tpu import Config
    from limovelo_tpu.step import TEL_DS_COUNT, TEL_MATCHES

    base = dict(
        real_time=True,
        min_dist=0.5,
        downsample_prec=0.5,
        map_table_size=1 << 17,
    )

    # ---- phase 1: COMPILE everything that will be timed (no readbacks) ----
    cfg_prod = Config(**base)
    cfg_r1 = Config(**base, knn_rings=1)
    ctx_prod = _make_step(cfg_prod)
    ctx_r1 = _make_step(cfg_r1)

    # calibration gather: the same access pattern as the KNN slot gather
    # (random (T,S,3) table rows), known bytes, to measure achievable GB/s
    static_prod = ctx_prod["static"]
    mb = static_prod.knn_max_buckets or (2 * static_prod.knn_rings + 1) ** 3
    slots = ctx_prod["grid"].slots if hasattr(ctx_prod["grid"], "slots") else 64
    T = 1 << 17
    nq, take = 2048, mb
    table = jnp.asarray(np.random.default_rng(1).normal(
        size=(T, slots, 3)).astype(np.float32))
    gidx = jnp.asarray(np.random.default_rng(2).integers(
        0, T, size=(nq, take)).astype(np.int32))

    @jax.jit
    def gather_probe(tb, ix):
        return tb[ix].sum(axis=(1, 2, 3))

    gp = gather_probe(table, gidx)
    jax.block_until_ready(gp)
    probe_bytes = nq * take * slots * 3 * 4

    # ---- phase 2: ALL timed loops (block_until_ready only) ---------------
    # print each number the moment it exists (prints are host-only, not
    # readbacks): if a later phase dies — the tunnel can abort a session —
    # the timings survive on stdout
    p50_prod = _time_step(ctx_prod)
    hz_prod = 1.0 / p50_prod
    print(f"[kernel] production rings={static_prod.knn_rings} "
          f"(max_buckets={mb}): p50={p50_prod*1e3:.3f} ms  {hz_prod:.0f} Hz",
          flush=True)
    p50_r1 = _time_step(ctx_r1)
    hz_r1 = 1.0 / p50_r1
    print(f"[kernel] rings=1 (27-bucket, exact to 0.8 m):  "
          f"p50={p50_r1*1e3:.3f} ms  {hz_r1:.0f} Hz", flush=True)
    print(f"[kernel] full-gate KNN coverage costs "
          f"{(p50_prod/p50_r1 - 1)*100:.1f}% step latency on the dense scene "
          f"(see [fidelity] for what it buys)")
    glat = []
    for _ in range(30):
        t0 = time.perf_counter()
        gp = gather_probe(table, gidx)
        jax.block_until_ready(gp)
        glat.append(time.perf_counter() - t0)
    p50_gather = float(np.percentile(glat, 50))
    probe_gbps = probe_bytes / p50_gather / 1e9
    print(f"[kernel] calibration gather: {probe_bytes/1e6:.0f} MB in "
          f"{p50_gather*1e3:.3f} ms = {probe_gbps:.0f} GB/s achievable "
          f"(v5e nominal HBM 819 GB/s)", flush=True)

    # ---- phase 3: readbacks (poisons the process — measured honestly) ----
    matches_prod = matches_r1 = -1
    ds_count = 2048
    first_read_ms = float("nan")
    p50_poisoned = float("nan")
    try:
        t0 = time.perf_counter()
        tele_prod = np.asarray(ctx_prod["out_last"].telemetry)  # FIRST readback
        first_read_ms = (time.perf_counter() - t0) * 1e3
        tele_r1 = np.asarray(ctx_r1["out_last"].telemetry)
        matches_prod = int(tele_prod[TEL_MATCHES])
        matches_r1 = int(tele_r1[TEL_MATCHES])
        ds_count = max(int(tele_prod[TEL_DS_COUNT]), 1)
        # poisoned blocking dispatch (what r03 accidentally measured)
        from limovelo_tpu.step import lio_step

        plat = []
        for _ in range(10):
            t0 = time.perf_counter()
            out = lio_step(ctx_prod["inp"], ctx_prod["m"], ctx_prod["static"],
                           ctx_prod["grid"])
            jax.block_until_ready(out.x)
            plat.append(time.perf_counter() - t0)
            ctx_prod["m"] = out.map
        p50_poisoned = float(np.percentile(plat, 50))
    except Exception as e:  # noqa: BLE001 — tunnel readbacks can abort
        print(f"[readback] FAILED ({type(e).__name__}): {e}")
    print(f"[kernel] matches: production={matches_prod} rings1={matches_r1} "
          f"(-1 = readback unavailable)")
    print(f"[readback] first device->host read: {first_read_ms:.1f} ms; "
          f"blocking dispatch after it: p50={p50_poisoned*1e3:.2f} ms "
          f"(the runtime's degraded mode — r03 recorded THIS number; the "
          f"pipeline below amortizes it with depth-K async readback)",
          flush=True)

    # ---- fidelity: sparse-map rings comparison ---------------------------
    fid = {"rings1_recall": float("nan"), "prod_recall": float("nan")}
    try:
        fid = _sparse_fidelity(cfg_prod)
        print(f"[fidelity] sparse map ({fid['oracle_pairs']} oracle pairs <= "
              f"MAX_DIST_PLANE): rings=1 -> {fid['rings1_pairs']} matches, "
              f"recall {fid['rings1_recall']*100:.1f}%; production -> "
              f"{fid['prod_pairs']} matches, recall "
              f"{fid['prod_recall']*100:.1f}%", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[fidelity] FAILED ({type(e).__name__}): {e}")

    # ---- pipeline bench ---------------------------------------------------
    upd_hz = scans_s = 0.0
    pl = {"update_wall_p50_ms": float("nan")}
    try:
        pipe_cfg = Config(
            real_time=False, min_dist=0.5, downsample_prec=0.3,
            full_rotation_time=0.1, imu_rate=200.0, real_time_delay=0.1,
            empty_lidar_time=0.5, degeneracy_threshold=0.0,
            covariance_acceleration=1e-2, covariance_gyroscope=1e-3,
            point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
            imu_buckets=(64,), map_table_size=1 << 14,
        )
        pl = _pipeline_bench(pipe_cfg)
        upd_hz = pl["updates"] / pl["wall_s"] if pl["wall_s"] else 0.0
        scans_s = pl["scans"] / pl["wall_s"] if pl["wall_s"] else 0.0
        print(f"[pipeline] {pl['updates']} updates / {pl['scans']} scans in "
              f"{pl['wall_s']:.2f} s -> {upd_hz:.1f} updates/s, "
              f"{scans_s:.1f} scans/s (mean window {pl['mean_ds']:.0f} "
              f"ds-points; per-step telemetry resolved with depth-K lag, "
              f"publishers live)", flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"[pipeline] FAILED ({type(e).__name__}): {e}")

    # ---- roofline ---------------------------------------------------------
    # the KNN slot gather moves ~max_buckets*slots*12 B (xyz f32; occupancy
    # derives from the FAR sentinel — no cell_d2 fetch since r03) per query
    # per SEARCH.  match_mode="auto" (production default) searches ONCE per
    # steady-state step; "rematch" pays one per GN iteration.
    searches = 1 if getattr(static_prod, "match_mode", "rematch") == "auto" else 3
    gather_bytes = ds_count * mb * slots * 12 * searches
    gbps = gather_bytes / p50_prod / 1e9
    print(f"[roofline] KNN slot gather ~{gather_bytes/1e6:.0f} MB/step "
          f"({searches} search(es)/step at match_mode="
          f"{getattr(static_prod, 'match_mode', 'rematch')!r}, "
          f"{ds_count} ds-queries) -> {gbps:.0f} GB/s at the measured "
          f"{p50_prod*1e3:.3f} ms p50.  Calibration: a raw gather of the "
          f"same pattern achieves {probe_gbps:.0f} GB/s on this chip "
          f"(v5e nominal HBM 819 GB/s).  MXU work is ~0.3 MFLOP/step — "
          f"the step is gather/bandwidth-bound, not MXU-bound.")

    # ---- driver contract: LAST line is the one JSON object ----------------
    def _num(x, nd=3):
        try:
            v = round(float(x), nd)
            return v if v == v else None   # NaN → null
        except (TypeError, ValueError):
            return None

    print(json.dumps({
        "metric": "lio_update_rate",
        "value": round(hz_prod, 2),
        "unit": "Hz",
        "vs_baseline": round(hz_prod / 100.0, 3),
        "kernel_hz_rings1": round(hz_r1, 2),
        "first_readback_ms": _num(first_read_ms, 2),
        "poisoned_dispatch_ms": _num(p50_poisoned * 1e3, 3),
        "pipeline_updates_per_s": round(upd_hz, 2),
        "pipeline_scans_per_s": round(scans_s, 2),
        "update_wall_p50_ms": _num(pl["update_wall_p50_ms"], 3),
        "sparse_recall_rings1": _num(fid["rings1_recall"], 4),
        "sparse_recall_prod": _num(fid["prod_recall"], 4),
        "gather_gbps": round(gbps, 1),
        "gather_probe_gbps": round(probe_gbps, 1),
    }))


if __name__ == "__main__":
    main()
