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
