"""Reproducible accuracy battery → EVAL.md (VERDICT r2 #5).

One entry point (`python -m limovelo_tpu eval`) regenerates every accuracy
number the project claims, so rounds can diff them.  Scenarios mirror the
reference's validation surface (SURVEY.md §4: KITTI replay, Xaloc-style
racing, offline/online mapping) plus the beyond-reference modes
(HD-map prelocalization).

Each row: scenario, ATE RMSE (m), updates, data-time update rate, map points.
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Callable, List, Optional

import numpy as np


@dataclass
class EvalRow:
    scenario: str
    ate_m: float
    updates: int
    update_hz: float          # updates per second of DATA time
    map_points: int
    wall_s: float
    note: str = ""


def _row(name, pipe, sim, wall, note=""):
    from .evaluate import ate_rmse

    res = pipe.result
    rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
    span = res.times[-1] - res.times[0] if len(res.records) > 1 else 1.0
    return EvalRow(
        scenario=name,
        ate_m=float(rmse),
        updates=len(res.records),
        update_hz=(len(res.records) - 1) / max(span, 1e-9),
        map_points=int(res.records[-1].map_points) if res.records else 0,
        wall_s=wall,
        note=note,
    )


def run_eval(fast: bool = False) -> List[EvalRow]:
    """Run the battery; `fast` trims durations (CI smoke)."""
    from limovelo_tpu import Config
    from limovelo_tpu.config import InitializationParams
    from limovelo_tpu.io.simulate import (
        circle_trajectory,
        corridor_trajectory,
        corridor_world,
        replay_into,
        room_world,
        simulate,
    )
    from limovelo_tpu.mapping import GridParams
    from .pipeline import LioPipeline

    rows: List[EvalRow] = []
    dur = 0.5 if fast else 1.0   # duration scale

    def sim_cfg(**kw):
        base = dict(
            real_time=False, mapping_online=True, min_dist=0.5,
            downsample_prec=0.3, full_rotation_time=0.1, imu_rate=200.0,
            real_time_delay=0.1, empty_lidar_time=0.5,
            degeneracy_threshold=0.0, covariance_acceleration=1e-2,
            covariance_gyroscope=1e-3,
            point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
            imu_buckets=(64, 128), map_table_size=1 << 14,
        )
        base.update(kw)
        return Config(**base)

    grid_small = GridParams(table_size=1 << 14, coarse_factor=4,
                            voxel_size=0.2, probe_length=8)
    grid_long = GridParams(table_size=1 << 17, coarse_factor=4,
                           voxel_size=0.2, probe_length=8)

    # ---- 1. room circle, online vs offline mapping ----------------------
    cfg = sim_cfg()
    traj = circle_trajectory(radius=4.0, omega=0.4)
    world = room_world(size=24.0, n_boxes=10)
    sim = simulate(world, traj, cfg, duration=5.0 * dur, lidar_lines=12,
                   pts_per_line=180, imu_rate=200.0, seed=7)
    for online in (True, False):
        c = cfg.replace(mapping_online=online)
        pipe = LioPipeline(c, grid=grid_small)
        t0 = time.perf_counter()
        replay_into(pipe, sim)
        pipe.flush()
        rows.append(_row(
            f"room circle · mapping {'online' if online else 'offline'}",
            pipe, sim, time.perf_counter() - t0,
        ))

    # ---- 2. prelocalization against a frozen HD map ----------------------
    import tempfile

    from .checkpoint import save_map

    with tempfile.NamedTemporaryFile(suffix=".npz") as f:
        builder = LioPipeline(cfg, grid=grid_small)
        replay_into(builder, sim)
        builder.flush()
        save_map(f.name, builder.map, builder.grid)
        pipe = LioPipeline.from_hd_map(cfg, f.name, grid=grid_small)
        t0 = time.perf_counter()
        replay_into(pipe, sim)
        pipe.flush()
        rows.append(_row("room circle · HD-map prelocalization (frozen map)",
                         pipe, sim, time.perf_counter() - t0,
                         note="mapping=none"))

    # ---- 3. racing envelope: 20 m/s straight, 100 deg/s turn -------------
    racing = sim_cfg(
        real_time=True, imu_rate=400.0, downsample_prec=0.4,
        map_table_size=1 << 17,
        Initialization=InitializationParams(times=(0.5, 1.0),
                                            deltas=(0.1, 0.05, 0.02)),
    )
    traj = corridor_trajectory(speed=20.0, weave=0.3, ramp=1.5, hold=0.5)
    world = corridor_world(length=180.0, width=8.0, pillar_every=6.0)
    sim = simulate(world, traj, racing, duration=8.0 * dur, lidar_lines=12,
                   pts_per_line=200, imu_rate=400.0, seed=21)
    pipe = LioPipeline(racing, grid=grid_long)
    t0 = time.perf_counter()
    replay_into(pipe, sim, spin_every_imu=True)
    pipe.flush()
    rows.append(_row("corridor straight · 20 m/s · real-time windows",
                     pipe, sim, time.perf_counter() - t0,
                     note="README.md:19 envelope"))

    omega = np.deg2rad(100.0)
    traj = circle_trajectory(radius=20.0 / omega, omega=omega, ramp=1.5, hold=0.5)
    world = room_world(size=56.0, n_boxes=16, seed=4)
    sim = simulate(world, traj, racing, duration=6.0 * dur, lidar_lines=12,
                   pts_per_line=220, imu_rate=400.0, seed=22)
    pipe = LioPipeline(racing, grid=grid_long)
    t0 = time.perf_counter()
    replay_into(pipe, sim, spin_every_imu=True)
    pipe.flush()
    rows.append(_row("circle turn · 100 deg/s at 20 m/s · real-time windows",
                     pipe, sim, time.perf_counter() - t0))

    # ---- 3b. the reference's headline 100 Hz localization mode -----------
    # delta = 0.01 s real-time windows (README.md:13-15) at the FULL racing
    # turn envelope: state updates 10× faster than the scan rate, partial
    # fields of view per window.  The warm-up must start at a full rotation
    # and finish shrinking only after the launch ramp (measured r5 —
    # tests/test_racing.test_100hz_localization_mode)
    hz100 = sim_cfg(
        real_time=True, imu_rate=400.0, downsample_prec=0.4,
        map_table_size=1 << 17,
        Initialization=InitializationParams(times=(0.5, 1.0, 1.5),
                                            deltas=(0.1, 0.05, 0.02, 0.01)),
    )
    omega = np.deg2rad(100.0)
    traj = circle_trajectory(radius=20.0 / omega, omega=omega, ramp=1.5, hold=0.5)
    world = room_world(size=56.0, n_boxes=16, seed=4)
    sim = simulate(world, traj, hz100, duration=6.0 * dur, lidar_lines=12,
                   pts_per_line=220, imu_rate=400.0, seed=22)
    pipe = LioPipeline(hz100, grid=grid_long)
    t0 = time.perf_counter()
    replay_into(pipe, sim, spin_every_imu=True)
    pipe.flush()
    rows.append(_row("100 Hz windows · delta=0.01 s · 100 deg/s at 20 m/s",
                     pipe, sim, time.perf_counter() - t0,
                     note="README.md:13-15 headline mode"))

    # ---- 4. dataset-format paths: KITTI drive + velodyne bag -------------
    import tempfile as _tf

    from limovelo_tpu.config import KITTI
    from limovelo_tpu.io.fixtures import write_kitti_drive, write_rosbag

    kcfg = KITTI.replace(
        min_dist=0.5, downsample_prec=0.3, downsample_rate=1,
        imu_rate=200.0, real_time_delay=0.1, empty_lidar_time=0.5,
        degeneracy_threshold=0.0, covariance_acceleration=1e-2,
        covariance_gyroscope=1e-3,
        point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
        imu_buckets=(64,), map_table_size=1 << 14,
        Initialization=InitializationParams(times=(), deltas=(0.1,)),
    )
    with _tf.TemporaryDirectory() as td:
        from limovelo_tpu.io.kitti import KittiRawReader, feed_pipeline

        drive = td + "/2011_09_26_drive_9999_sync"
        sim = write_kitti_drive(drive, corridor_world(length=60.0),
                                corridor_trajectory(speed=4.0), kcfg,
                                duration=5.0 * dur, lidar_lines=12,
                                pts_per_line=200, seed=5)
        pipe = LioPipeline(kcfg)
        t0 = time.perf_counter()
        feed_pipeline(pipe, KittiRawReader(drive), kcfg)
        pipe.flush()
        rows.append(_row("KITTI raw drive (fixture) · CLI reader path",
                         pipe, sim, time.perf_counter() - t0,
                         note="KITTI profile extrinsics/gravity"))

    for stamp_b, off_b in ((True, True), (False, True)):
        # downsample_rate=1: the Config default of 4 (reference parity,
        # config/params.yaml:35) made these rows run on 25% of the points
        # the direct-replay rows see — the r3/r4 "velodyne end-stamp
        # outlier" was exactly this (VERDICT r4 #7 resolution; the decode
        # itself is exact for all four stamp combinations, test_io)
        bcfg = sim_cfg(stamp_beginning=stamp_b, offset_beginning=off_b,
                       downsample_rate=1,
                       LiDAR_type="velodyne",
                       points_topic="/velodyne_points",
                       imus_topic="/vectornav/IMU")
        with _tf.NamedTemporaryFile(suffix=".bag") as f:
            from limovelo_tpu.io.rosbag import feed_pipeline as feed_bag

            traj = circle_trajectory(radius=4.0, omega=0.4, ramp=1.0, hold=0.5)
            world = room_world(size=24.0, n_boxes=10)
            sim = simulate(world, traj, bcfg, duration=4.0 * dur,
                           lidar_lines=12, pts_per_line=180,
                           imu_rate=200.0, seed=9)
            write_rosbag(f.name, sim, bcfg)
            pipe = LioPipeline(bcfg, grid=grid_small)
            t0 = time.perf_counter()
            feed_bag(pipe, f.name, bcfg)
            pipe.flush()
            rows.append(_row(
                f"velodyne bag · stamp_beginning={stamp_b} offset_beginning={off_b}",
                pipe, sim, time.perf_counter() - t0))
    return rows


def run_real_eval(
    kitti_root: Optional[str] = None,
    bag: Optional[str] = None,
    gt_tum: Optional[str] = None,
    config=None,
    max_scans: Optional[int] = None,
) -> List[EvalRow]:
    """Real-dataset parity protocol (`eval --kitti-root ... / --bag ...`).

    Runs the FULL pipeline over on-disk data through the production reader
    paths and scores ATE against ground truth:

    - ``kitti_root``: a KITTI raw ``*_sync`` drive dir (the reference's KITTI
      reproduction target, `config/kitti.yaml:3,8-9`).  Ground truth comes
      from ``gt_tum`` if given, else is derived from the drive's own OXTS
      GPS/INS channel (`io/kitti.oxts_trajectory`, devkit mercator).
    - ``bag``: a ROS1 bag (the Xaloc slow/fast protocol, README.md:70-77);
      ``gt_tum`` (TUM `t x y z qx qy qz qw`) is required — racing bags carry
      no GPS.

    Proven end-to-end on in-repo same-format fixtures
    (tests/test_real_eval.py); see EVAL.md §Real data for what could and
    could not run in this environment.
    """
    import time as _time

    from .evaluate import ate_rmse
    from .pipeline import LioPipeline

    rows: List[EvalRow] = []

    def _score(name, pipe, gt_t, gt_R, gt_p, wall, note=""):
        res = pipe.result
        if not res.records:
            # a run that never produced an accepted update (bad extrinsics,
            # truncated drive) must report a failed row, not crash with an
            # opaque indexing error inside ate_rmse (ADVICE r4)
            rows.append(EvalRow(
                scenario=name, ate_m=float("nan"), updates=0, update_hz=0.0,
                map_points=0, wall_s=wall,
                note=(note + "; " if note else "") + "NO UPDATES — run failed",
            ))
            return
        rmse, _ = ate_rmse(res.times, res.positions, gt_t, gt_R, gt_p)
        span = res.times[-1] - res.times[0] if len(res.records) > 1 else 1.0
        rows.append(EvalRow(
            scenario=name, ate_m=float(rmse), updates=len(res.records),
            update_hz=(len(res.records) - 1) / max(span, 1e-9),
            map_points=int(res.records[-1].map_points) if res.records else 0,
            wall_s=wall, note=note,
        ))

    def _load_tum(path):
        d = np.loadtxt(path)
        from scipy.spatial.transform import Rotation as Rsc

        return (d[:, 0], Rsc.from_quat(d[:, 4:8]).as_matrix().astype(np.float32),
                d[:, 1:4])

    if kitti_root:
        from limovelo_tpu.config import KITTI
        from limovelo_tpu.io.kitti import (KittiRawReader, feed_pipeline,
                                           oxts_trajectory)

        cfg = config or KITTI
        reader = KittiRawReader(kitti_root)
        if gt_tum:
            gt_t, gt_R, gt_p = _load_tum(gt_tum)
            gt_note = "GT: " + gt_tum
        else:
            gt_t, gt_R, gt_p = oxts_trajectory(reader)
            gt_note = "GT: OXTS mercator"
        pipe = LioPipeline(cfg)
        t0 = _time.perf_counter()
        feed_pipeline(pipe, reader, cfg, max_scans=max_scans)
        pipe.flush()
        _score(f"KITTI raw · {kitti_root.rstrip('/').rsplit('/', 1)[-1]}",
               pipe, gt_t, gt_R, gt_p, _time.perf_counter() - t0, gt_note)

    if bag:
        from limovelo_tpu.config import XALOC
        from limovelo_tpu.io.rosbag import feed_pipeline as feed_bag

        if not gt_tum:
            raise SystemExit("--bag scoring needs --gt <tum file> "
                             "(racing bags carry no GPS ground truth)")
        cfg = config or XALOC
        gt_t, gt_R, gt_p = _load_tum(gt_tum)
        pipe = LioPipeline(cfg)
        t0 = _time.perf_counter()
        feed_bag(pipe, bag, cfg)
        pipe.flush()
        _score(f"rosbag · {bag.rsplit('/', 1)[-1]}", pipe, gt_t, gt_R, gt_p,
               _time.perf_counter() - t0, "GT: " + gt_tum)

    return rows


REAL_DATA_NOTE = """## Real data

The reference's quantitative targets are KITTI seq 00 and the public Xaloc
`slow`/`fast` rosbags (BASELINE.json; `/root/reference/config/kitti.yaml:3,8-9`,
`README.md:70-77`).  **Those datasets cannot enter this environment** (the
container has zero network egress and no KITTI/Xaloc files are baked in), so
the rows above come from the synthetic battery plus same-format fixtures that
exercise the REAL reader/decoder/GT paths end to end
(`io/fixtures.write_kitti_drive` / `write_rosbag` → `io/kitti.py` /
`io/rosbag.py`; regression-locked by tests/test_real_eval.py).

Where the datasets ARE available, the one-command protocol is:

```
# KITTI raw drive (GT auto-derived from the drive's OXTS via the devkit
# mercator projection, or pass --gt <poses.tum>):
python -m limovelo_tpu eval --kitti-root /data/2011_10_03/2011_10_03_drive_0027_sync

# Xaloc bag (TUM ground truth required):
python -m limovelo_tpu eval --bag xaloc_fast.bag --gt xaloc_fast_gt.tum
```

Both paths append their rows to this file's table and use the same ATE
scoring (`runtime/evaluate.ate_rmse`, Umeyama-aligned) as every synthetic
row, so the numbers are directly comparable.
"""


def write_eval_md(rows: List[EvalRow], path: str = "EVAL.md",
                  real_rows: Optional[List[EvalRow]] = None) -> str:
    import datetime

    lines = [
        "# EVAL — measured accuracy (regenerate: `python -m limovelo_tpu eval`)",
        "",
        f"Backend: see run log.  Generated {datetime.datetime.now():%Y-%m-%d %H:%M}.",
        "",
        "| scenario | ATE RMSE (m) | updates | update rate (Hz, data time) | map points | wall (s) | note |",
        "|---|---|---|---|---|---|---|",
    ]
    for r in rows:
        lines.append(
            f"| {r.scenario} | {r.ate_m:.4f} | {r.updates} | {r.update_hz:.1f} "
            f"| {r.map_points} | {r.wall_s:.1f} | {r.note} |"
        )
    lines += [
        "",
        "Thresholds enforced in CI: the racing scenarios must stay under",
        "0.10 m ATE (ratcheted r5 against 0.044-0.058 m measured over 3+2",
        "seeds, tests/test_racing.py); the room-circle, 100 Hz, and",
        "dataset-format paths land at centimeter level with the tighter",
        "bounds in their test files.",
        "",
        "**Racing-accuracy root cause (r5, closes the r1-r4 0.13-0.18 m",
        "ceiling):** the 23x23 Gauss-Newton solve chain (P-inverse, chart",
        "transport, S assembly, delta-solve, posterior) ran in f32; at",
        "racing dynamics the GN fixed point sits close enough to f32",
        "rounding that the per-window update error behaved as a small",
        "backend-dependent bias, compounding through the sequential",
        "map-feedback loop into ~0.15 m ATE (and flipping",
        "extrinsics-convergence direction between machines).  Running only",
        "that chain in f64 (StaticConfig.solve_dtype; the N-point HtH",
        "reductions stay f32 MXU sums) cut the 20 m/s straight from",
        "0.134-0.177 m to 0.045-0.058 m and the 100 deg/s turn from 0.18 m",
        "to 0.044-0.048 m, at zero measured kernel-rate cost (4837 Hz).",
        "The residual error is scenario observability, not estimator bias:",
        "on the corridor the gravity-leak/pitch ambiguity absorbs ~1 deg of",
        "tilt into accel bias (unobservable without pitch excitation), which",
        "rigid alignment mostly removes.  A second r5 fix closed the last",
        "backend spread: the auto match-mode's re-search trigger",
        "(match_refresh_m) at its old 0.10 m froze matching at the predicted",
        "(short) pose whenever per-window GN corrections stayed under 10 cm,",
        "accumulating a ~0.3% along-track scale deficit at 20 m/s (TPU",
        "corridor 0.134 m).  Re-tuned to 0.05 m — below the racing-speed",
        "innovation scale (chip sweep: corridor 0.134/0.060/0.054 m and turn",
        "0.051/0.041/0.087 m at 0.10/0.05/0.02) — both racing rows land at",
        "centimeter level, at one KNN gather per converged step.",
        "",
        REAL_DATA_NOTE,
    ]
    if real_rows:
        lines += [
            "### Measured on local data this run",
            "",
            "| dataset | ATE RMSE (m) | updates | update rate (Hz) | note |",
            "|---|---|---|---|---|",
        ]
        for r in real_rows:
            lines.append(f"| {r.scenario} | {r.ate_m:.4f} | {r.updates} "
                         f"| {r.update_hz:.1f} | {r.note} |")
        lines.append("")
    text = "\n".join(lines)
    with open(path, "w") as f:
        f.write(text)
    return text
