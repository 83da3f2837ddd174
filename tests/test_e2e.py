"""End-to-end odometry on synthetic worlds: the golden-trajectory tests the
reference never had (SURVEY.md §4 implications)."""

import numpy as np
import pytest

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import (
    circle_trajectory,
    corridor_trajectory,
    corridor_world,
    replay_into,
    room_world,
    simulate,
)
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline

SMALL_GRID = GridParams(table_size=1 << 14, coarse_factor=4, voxel_size=0.2, probe_length=8)


def run_pipeline(config, sim, grid=SMALL_GRID):
    pipe = LioPipeline(config, grid=grid)
    replay_into(pipe, sim)  # stream in time order (readiness is buffer-based)
    return pipe


@pytest.fixture(scope="module")
def sim_config():
    return Config(
        real_time=False,
        mapping_online=True,
        min_dist=0.5,
        downsample_prec=0.3,
        full_rotation_time=0.1,
        imu_rate=200.0,
        real_time_delay=0.1,
        empty_lidar_time=0.5,
        degeneracy_threshold=0.0,     # tiny synthetic windows: no gating
        covariance_acceleration=1e-2,
        covariance_gyroscope=1e-3,
        point_buckets=(2048, 4096, 8192),
        ds_buckets=(1024, 2048),
        imu_buckets=(64,),
        map_table_size=1 << 14,
    )


@pytest.mark.slow
class TestEndToEnd:
    def test_static_platform(self, sim_config):
        """Zero motion → estimator must stay put (drift < 5 cm over 3 s)."""
        from limovelo_tpu.io.simulate import Trajectory

        traj = Trajectory(lambda t: np.array([0.0, 0.0, 1.5]), lambda t: 0.0)
        world = room_world(size=16.0)
        sim = simulate(world, traj, sim_config, duration=3.0, lidar_lines=8,
                       pts_per_line=128, imu_rate=200.0, seed=1)
        pipe = run_pipeline(sim_config, sim)
        assert len(pipe.result.records) > 10
        drift = np.linalg.norm(pipe.result.positions - np.array([0, 0, 0]), axis=-1)
        assert drift.max() < 0.05, f"static drift {drift.max():.3f} m"

    def test_corridor_drive(self, sim_config):
        """5 m/s corridor drive, ATE (aligned) under 30 cm over ~8 s."""
        traj = corridor_trajectory(speed=5.0)
        world = corridor_world(length=80.0)
        sim = simulate(world, traj, sim_config, duration=8.0, lidar_lines=12,
                       pts_per_line=180, imu_rate=200.0, seed=2)
        pipe = run_pipeline(sim_config, sim)
        res = pipe.result
        assert len(res.records) > 40
        rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
        assert rmse < 0.30, f"corridor ATE RMSE {rmse:.3f} m"

    def test_circle_turn(self, sim_config):
        """Sustained turning (~30 deg/s) in a cluttered room."""
        traj = circle_trajectory(radius=4.0, omega=0.5)
        world = room_world(size=24.0, n_boxes=10)
        sim = simulate(world, traj, sim_config, duration=6.0, lidar_lines=12,
                       pts_per_line=180, imu_rate=200.0, seed=3)
        pipe = run_pipeline(sim_config, sim)
        res = pipe.result
        assert len(res.records) > 30
        rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
        assert rmse < 0.30, f"circle ATE RMSE {rmse:.3f} m"

    def test_warmup_schedule_boundary(self, sim_config):
        """Offline (real_time=False) replay crossing an Initialization.times
        edge: `update_delta` is evaluated twice per spin with different
        arguments (pipeline.spin_once, matching main.cpp:63-66) — the window
        that STRADDLES the boundary advances by the OLD delta but is cut to
        the NEW delta, dropping the sliver in between (t1 = max(t2−delta,
        last_updated), main.cpp:69).  Lock the schedule: steps of the old
        delta before the edge, the new delta after, exactly one transition,
        strictly increasing times, accuracy unaffected (VERDICT r4 weak#9)."""
        from limovelo_tpu.config import InitializationParams

        # edge at 0.95 s — OFF the 0.1 s step grid, so one window genuinely
        # straddles it: it advances 0.1 from rel=0.9 but is cut to the new
        # delta 0.02, dropping the (0.9, 0.98] sliver exactly as the
        # reference does
        cfg = sim_config.replace(
            Initialization=InitializationParams(times=(0.95,),
                                                deltas=(0.1, 0.02)),
        )
        traj = circle_trajectory(radius=4.0, omega=0.4, ramp=1.0, hold=0.5)
        world = room_world(size=24.0, n_boxes=10)
        sim = simulate(world, traj, cfg, duration=4.0, lidar_lines=12,
                       pts_per_line=180, imu_rate=200.0, seed=7)
        pipe = run_pipeline(cfg, sim)
        res = pipe.result
        ts = res.times
        assert (np.diff(ts) > 0).all(), "record times must strictly increase"
        t0 = pipe.accum.initial_time
        rel = ts - t0
        d = np.diff(ts)
        # classify each step by the delta in force at its START time: steps
        # FROM rel<0.95 advance by 0.1 (old delta — including the straddling
        # one from rel=0.9), steps from rel>=0.95 advance by 0.02
        before = d[(rel[:-1] < 0.95 - 1e-9)]
        after = d[(rel[:-1] >= 0.95 - 1e-9)]
        assert len(before) >= 5 and len(after) >= 20
        np.testing.assert_allclose(before, 0.1, atol=1e-6)
        np.testing.assert_allclose(after, 0.02, atol=1e-6)
        # windows remain valid across the shrink: every record is an accepted
        # update with a real match set (the first builds the map — 0 matches
        # against an empty map by construction)
        assert all(r.num_matches > 0 for r in res.records[1:])
        rmse, _ = ate_rmse(ts, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
        assert rmse < 0.15, f"warm-up boundary ATE {rmse:.3f} m"
