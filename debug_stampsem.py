"""VERDICT r3 weak #9: why is the velodyne stamp_beginning=False bag path
worse?  (a) per-point time roundtrip exactness through write_rosbag ->
BagReader -> decode_scan, (b) the window schedule difference."""
import numpy as np

from limovelo_tpu import Config
from limovelo_tpu.io.fixtures import write_rosbag
from limovelo_tpu.io.pointcloud import decode_scan
from limovelo_tpu.io.rosbag import BagReader, decode_pointcloud2
from limovelo_tpu.io.simulate import circle_trajectory, room_world, simulate


def mk_cfg(stamp_b):
    return Config(
        real_time=False, min_dist=0.5, downsample_prec=0.3,
        full_rotation_time=0.1, imu_rate=200.0, real_time_delay=0.1,
        empty_lidar_time=0.5, degeneracy_threshold=0.0,
        covariance_acceleration=1e-2, covariance_gyroscope=1e-3,
        point_buckets=(2048, 4096, 8192), ds_buckets=(1024, 2048),
        imu_buckets=(64,), map_table_size=1 << 14,
        stamp_beginning=stamp_b, offset_beginning=True,
        LiDAR_type="velodyne", points_topic="/velodyne_points",
        imus_topic="/vectornav/IMU",
    )


for stamp_b in (True, False):
    cfg = mk_cfg(stamp_b)
    traj = circle_trajectory(radius=4.0, omega=0.4, ramp=1.0, hold=0.5)
    world = room_world(size=24.0, n_boxes=10)
    sim = simulate(world, traj, cfg, duration=4.0, lidar_lines=12,
                   pts_per_line=180, imu_rate=200.0, seed=9)
    path = f"/tmp/sb_{stamp_b}.bag"
    write_rosbag(path, sim, cfg)

    truth = {}  # rounded first-point time -> scan.t
    for scan in sim.scans:
        if len(scan.t):
            truth[round(float(scan.t[0]), 6)] = np.asarray(scan.t, np.float64)

    worst = 0.0
    n = 0
    arrival_lag = []
    for msg in BagReader(path).messages(["/velodyne_points"]):
        stamp, xyz, time_f, inten = decode_pointcloud2(msg.data)
        pts, t_abs, _ = decode_scan(xyz, time_f, stamp, cfg, intensity=inten)
        if len(t_abs) == 0:
            continue
        key = round(float(t_abs[0]), 6)
        # compare against the truth scan starting nearest to t_abs[0]
        k = min(truth, key=lambda kk: abs(kk - key))
        tt = truth[k]
        if len(tt) == len(t_abs):
            worst = max(worst, float(np.max(np.abs(np.sort(tt) - np.sort(t_abs)))))
            n += 1
        arrival_lag.append(stamp - float(t_abs[0]))
    print(f"stamp_beginning={stamp_b}: {n} scans compared, "
          f"worst per-point time err = {worst*1e6:.2f} us, "
          f"arrival lag (stamp - first point t) = "
          f"{np.mean(arrival_lag):.4f} s")
