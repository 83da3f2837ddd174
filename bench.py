"""Benchmark: kernel-level step rate AND pipeline-level scans/s on one chip.

Three sections (all on the real device this runs on):

1. KERNEL — p50 latency of the full jitted LIO step (predict + deskew +
   downsample + 3-iteration point-to-plane update + map insert) at a
   realistic 100 Hz window against a populated map, at BOTH KNN envelopes:
   rings=1 (27-bucket neighborhood, exact to 0.8 m) and the production
   derived-rings setting (covers the full MAX_DIST_PLANE=2 m gate, ≥99.5%
   recall vs exact oracle — tests/test_knn_fidelity.py).  This is the
   fidelity/latency tradeoff that moved BENCH between rounds (see BENCH.md).

2. PIPELINE — a deterministic sim replay through the production
   `LioPipeline` host loop (packed single-buffer transfer, async readback):
   updates/s of wall time, scans/s, and the host-vs-device split.

3. ROOFLINE — the match step is gather-bound, not MXU-bound: bytes touched
   by the KNN slot gather per step vs the measured step time, as a fraction
   of nominal HBM bandwidth.  The MXU work (N×12 HᵀH + 23×23 solves) is
   O(100 kFLOP)/step — microseconds at peak; stated, not the bottleneck.

Driver contract: the LAST line printed is ONE JSON object with
{"metric", "value", "unit", "vs_baseline"} (plus informational extras).
Baseline: the reference's headline 100 Hz localization rate (delta=0.01 s,
README.md:13-15, BASELINE.md).  vs_baseline = achieved_hz / 100.
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


def _kernel_bench(config, n_reps=50):
    """p50 step latency at a fixed 2048-pt 100 Hz window (one compile per
    distinct config).  Returns (p50_s, matches)."""
    import jax
    import jax.numpy as jnp

    from limovelo_tpu.config import DynParams
    from limovelo_tpu.filter.process import ImuWindow, process_noise_Q
    from limovelo_tpu.geometry import state as st
    from limovelo_tpu.mapping import GridParams, insert, make_map
    from limovelo_tpu.step import TEL_MATCHES, StepInputs, lio_step

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
    out = lio_step(inp, m, static_cfg, grid)   # compile
    jax.block_until_ready(out.x)
    matches = int(np.asarray(out.telemetry)[TEL_MATCHES])
    m = out.map
    lat = []
    for _ in range(n_reps):
        t0 = time.perf_counter()
        out = lio_step(inp, m, static_cfg, grid)
        jax.block_until_ready(out.x)
        lat.append(time.perf_counter() - t0)
        m = out.map
    return float(np.percentile(lat, 50)), matches, static_cfg


def _pipeline_bench(config):
    """Deterministic sim replay through the production LioPipeline host loop.
    Returns dict with updates, scans, wall_s, update p50 (host+device),
    mean ds_count."""
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

    from limovelo_tpu import Config

    base = dict(
        real_time=True,
        min_dist=0.5,
        downsample_prec=0.5,
        map_table_size=1 << 17,
    )

    # ---- 1. kernel bench at both KNN envelopes --------------------------
    p50_prod, matches_prod, static_prod = _kernel_bench(Config(**base))
    p50_r1, matches_r1, _ = _kernel_bench(Config(**base, knn_rings=1))
    hz_prod = 1.0 / p50_prod
    hz_r1 = 1.0 / p50_r1
    print(f"[kernel] production rings={static_prod.knn_rings} "
          f"(max_buckets={static_prod.knn_max_buckets}): "
          f"p50={p50_prod*1e3:.3f} ms  {hz_prod:.0f} Hz  matches={matches_prod}")
    print(f"[kernel] rings=1 (27-bucket, exact to 0.8 m):  "
          f"p50={p50_r1*1e3:.3f} ms  {hz_r1:.0f} Hz  matches={matches_r1}")
    print(f"[kernel] full-gate KNN coverage costs "
          f"{(p50_prod/p50_r1 - 1)*100:.1f}% step latency "
          f"(recall vs exact oracle regression-tested >=99.5%)")

    # ---- 2. pipeline bench ----------------------------------------------
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
    host_ms = None
    if pl["update_wall_p50_ms"] is not None:
        host_ms = max(pl["update_wall_p50_ms"] - p50_prod * 1e3, 0.0)
    print(f"[pipeline] {pl['updates']} updates / {pl['scans']} scans in "
          f"{pl['wall_s']:.2f} s -> {upd_hz:.1f} updates/s, {scans_s:.1f} scans/s "
          f"(mean window {pl['mean_ds']:.0f} ds-points)")
    print(f"[pipeline] update wall p50 = {pl['update_wall_p50_ms']:.2f} ms "
          f"(device step {p50_prod*1e3:.2f} ms -> host+transfer ~{host_ms:.2f} ms; "
          f"on a tunneled TPU the RPC round trip dominates the host share)")

    # ---- 3. roofline note -------------------------------------------------
    # the match gather touches max_buckets * slots * 16 B (xyz+d2) per query
    # per GN iteration; everything else in the step is O(N) elementwise or a
    # tiny (N,12) matmul.
    n_pts_ds = 2048
    iters = 3
    mb = static_prod.knn_max_buckets or (2 * static_prod.knn_rings + 1) ** 3
    slots = 64  # coarse_factor**3
    gather_bytes = n_pts_ds * mb * slots * 16 * iters
    gbps = gather_bytes / p50_prod / 1e9
    print(f"[roofline] KNN slot gather ~{gather_bytes/1e6:.0f} MB/step -> "
          f"{gbps:.0f} GB/s at measured p50 (HBM-bound; v5e nominal 819 GB/s "
          f"-> {gbps/819*100:.0f}% of peak). MXU work is ~0.3 MFLOP/step "
          f"(N x 12 HtH + 23x23 solves) — microseconds at peak; the step is "
          f"gather/bandwidth-bound, not MXU-bound.")

    # ---- driver contract: LAST line is the one JSON object ----------------
    print(json.dumps({
        "metric": "lio_update_rate",
        "value": round(hz_prod, 2),
        "unit": "Hz",
        "vs_baseline": round(hz_prod / 100.0, 3),
        "kernel_hz_rings1": round(hz_r1, 2),
        "pipeline_updates_per_s": round(upd_hz, 2),
        "pipeline_scans_per_s": round(scans_s, 2),
        "update_wall_p50_ms": round(pl["update_wall_p50_ms"], 3),
        "gather_gbps": round(gbps, 1),
    }))


if __name__ == "__main__":
    main()
