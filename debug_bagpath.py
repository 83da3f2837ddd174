"""Why does the SAME scenario score ~0.23 m through the bag path but ~0.02 m
via direct replay?  Bisect: direct replay vs bag replay vs bag with each
suspected difference removed."""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)

import tempfile

import numpy as np

from limovelo_tpu import Config
from limovelo_tpu.io.fixtures import write_rosbag
from limovelo_tpu.io.rosbag import feed_pipeline as feed_bag
from limovelo_tpu.io.simulate import (circle_trajectory, replay_into,
                                      room_world, simulate)
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


bcfg = sim_cfg(stamp_beginning=True, offset_beginning=True,
               LiDAR_type="velodyne", points_topic="/velodyne_points",
               imus_topic="/vectornav/IMU")
traj = circle_trajectory(radius=4.0, omega=0.4, ramp=1.0, hold=0.5)
world = room_world(size=24.0, n_boxes=10)
sim = simulate(world, traj, bcfg, duration=4.0, lidar_lines=12,
               pts_per_line=180, imu_rate=200.0, seed=9)


def score(pipe, tag):
    res = pipe.result
    rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
    print(f"{tag}: ATE={rmse:.4f} updates={len(res.records)} "
          f"init={pipe.accum.initial_time:.4f}", flush=True)


# A: direct replay of the same sim
pipe = LioPipeline(bcfg, grid=GridParams.from_config(bcfg))
replay_into(pipe, sim)
pipe.flush()
score(pipe, "A direct replay")

# B: bag roundtrip (the EVAL path)
with tempfile.NamedTemporaryFile(suffix=".bag") as f:
    write_rosbag(f.name, sim, bcfg)
    pipe = LioPipeline(bcfg, grid=GridParams.from_config(bcfg))
    feed_bag(pipe, f.name, bcfg)
    pipe.flush()
    score(pipe, "B bag replay  ")

# C: bag replay but ignoring the IMU orientation quaternion at init
with tempfile.NamedTemporaryFile(suffix=".bag") as f:
    write_rosbag(f.name, sim, bcfg)

    class NoQPipe(LioPipeline):
        def add_imu(self, t, a, w, q=None):
            super().add_imu(t, a, w, q=None)

    pipe = NoQPipe(bcfg, grid=GridParams.from_config(bcfg))
    feed_bag(pipe, f.name, bcfg)
    pipe.flush()
    score(pipe, "C bag, q=None ")

# D: direct replay but feeding scans decoded THROUGH the vendor decode
#    (min_dist/downsample applied twice — isolates decode_scan effects)
from limovelo_tpu.io.pointcloud import decode_scan

pipe = LioPipeline(bcfg, grid=GridParams.from_config(bcfg))
ii = 0
m = len(sim.imu_t)
for scan in sim.scans:
    scan_end = scan.t[-1] if len(scan.t) else 0.0
    while ii < m and sim.imu_t[ii] <= scan_end:
        pipe.add_imu(sim.imu_t[ii], sim.imu_a[ii], sim.imu_w[ii])
        ii += 1
    t0 = float(scan.t[0])
    rel = (scan.t - t0).astype(np.float32)
    pts, ts = decode_scan(bcfg, scan.pts, t0, time_field=rel)
    pipe.add_scan(pts, ts)
    pipe.spin()
while ii < m:
    pipe.add_imu(sim.imu_t[ii], sim.imu_a[ii], sim.imu_w[ii])
    ii += 1
pipe.spin()
pipe.flush()
score(pipe, "D direct+decode")
