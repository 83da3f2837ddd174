"""Is the velodyne end-stamp EVAL gap systematic or run-to-run scatter?
Same scenario, 3 sim seeds × both stamp semantics → ATE matrix."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import tempfile

from limovelo_tpu import Config
from limovelo_tpu.io.fixtures import write_rosbag
from limovelo_tpu.io.rosbag import feed_pipeline as feed_bag
from limovelo_tpu.io.simulate import circle_trajectory, room_world, simulate
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline


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


for seed in (9, 10, 11):
    for stamp_b in (True, False):
        bcfg = sim_cfg(stamp_beginning=stamp_b, offset_beginning=True,
                       LiDAR_type="velodyne", points_topic="/velodyne_points",
                       imus_topic="/vectornav/IMU")
        traj = circle_trajectory(radius=4.0, omega=0.4, ramp=1.0, hold=0.5)
        world = room_world(size=24.0, n_boxes=10)
        sim = simulate(world, traj, bcfg, duration=4.0, lidar_lines=12,
                       pts_per_line=180, imu_rate=200.0, seed=seed)
        with tempfile.NamedTemporaryFile(suffix=".bag") as f:
            write_rosbag(f.name, sim, bcfg)
            pipe = LioPipeline(bcfg, grid=GridParams.from_config(bcfg))
            feed_bag(pipe, f.name, bcfg)
            pipe.flush()
        res = pipe.result
        rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
        print(f"seed={seed} stamp_beginning={stamp_b}: ATE={rmse:.4f} "
              f"updates={len(res.records)} init_t={pipe.accum.initial_time:.4f}",
              flush=True)
