"""SLAM layer: keyframing + loop closure on a revisiting trajectory."""

import numpy as np
import pytest

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import circle_trajectory, replay_into, room_world, simulate
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.slam import SlamPipeline

GRID = GridParams(table_size=1 << 14, coarse_factor=4, voxel_size=0.2, probe_length=8)


@pytest.mark.slow
class TestSlamPipeline:
    def test_keyframes_and_backend(self):
        cfg = Config(
            real_time=False, mapping_online=True, min_dist=0.5, downsample_prec=0.3,
            full_rotation_time=0.1, imu_rate=200.0, real_time_delay=0.1,
            empty_lidar_time=0.5, degeneracy_threshold=0.0,
            covariance_acceleration=1e-2, covariance_gyroscope=1e-3,
            point_buckets=(2048, 4096), ds_buckets=(1024,), imu_buckets=(64,),
            map_table_size=1 << 14,
        )
        # one full circle (~12.6 s at ω=0.5 → use 2π/0.5 ≈ 12.6 s): revisits start
        traj = circle_trajectory(radius=4.0, omega=0.8)
        world = room_world(size=24.0, n_boxes=8)
        sim = simulate(world, traj, cfg, duration=8.5, lidar_lines=10,
                       pts_per_line=160, imu_rate=200.0, seed=5)
        pipe = SlamPipeline(
            cfg, grid=GRID,
            kf_min_translation=1.0,
            loop_check_every=2,
            loop_min_index_gap=8,
            loop_max_distance=3.0,
        )
        replay_into(pipe, sim)

        assert len(pipe.result.records) > 30
        assert len(pipe.keyframes) >= 5, "keyframe selector never fired"

        Rs, ps = pipe.optimized_trajectory()
        assert len(ps) == len(pipe.keyframes)
        # optimization must not blow up the trajectory (odometry already good)
        drift = np.linalg.norm(ps - pipe.keyframes.positions(optimized=False), axis=-1)
        assert drift.max() < 1.0
