"""Instrument the failing online-extrinsics test: per-step component-wise
extrinsic rotation error (is the observable pitch converging? is yaw
drifting?), translation error, and ATE."""

import os as _os
if _os.environ.get("FORCE_CPU"):
    import jax as _jax
    _jax.config.update("jax_platforms", "cpu")
import numpy as np
from scipy.spatial.transform import Rotation as Rsc

from limovelo_tpu.io.simulate import circle_trajectory, replay_into, room_world, simulate
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline

from tests.test_racing import GRID, racing_cfg

R_true = Rsc.from_euler("xyz", [0.0, 0.01, 0.02]).as_matrix()
t_true = np.array([0.8, 0.0, 0.3])
cfg = racing_cfg(
    estimate_extrinsics=True,
    I_Rotation_L=tuple(np.eye(3).ravel()),
    I_Translation_L=(0.7, 0.05, 0.25),
    initial_cov_extrinsic_rot=(1e-4, 1e-4, 1e-8),
    initial_cov_extrinsic_trans=1e-4,
    real_time=False,
)
import sys
for kv in sys.argv[1:]:
    k, v = kv.split("=")
    cfg = cfg.replace(**{k: float(v)})

omega = 0.6
traj = circle_trajectory(radius=5.0, omega=omega, ramp=1.0, hold=0.5, sway=0.05)
world = room_world(size=26.0, n_boxes=12, seed=6)
sim = simulate(world, traj, cfg, duration=8.0, lidar_lines=12,
               pts_per_line=200, imu_rate=400.0, seed=23,
               extrinsics=(R_true, t_true))
pipe = LioPipeline(cfg, grid=GRID)
replay_into(pipe, sim)
res = pipe.result

print(f"{len(res.records)} records")
for rec in res.records[:: max(len(res.records) // 25, 1)]:
    R_est = Rsc.from_rotvec(rec.extr_rotvec).as_matrix()
    dr = Rsc.from_matrix(R_est.T @ R_true).as_rotvec()   # residual error vec
    dt = rec.extr_t - t_true
    print(f"t={rec.t:5.2f}  rot_err={np.linalg.norm(dr):.5f} rad "
          f"[{dr[0]:+.4f} {dr[1]:+.4f} {dr[2]:+.4f}]  "
          f"t_err={np.linalg.norm(dt):.4f} [{dt[0]:+.3f} {dt[1]:+.3f} {dt[2]:+.3f}]")
last = res.records[-1]
R_est = Rsc.from_rotvec(last.extr_rotvec).as_matrix()
rot_err = np.linalg.norm(Rsc.from_matrix(R_est.T @ R_true).as_rotvec())
rot_err0 = np.linalg.norm(Rsc.from_matrix(R_true).as_rotvec())
t_err = np.linalg.norm(last.extr_t - t_true)
rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
print(f"FINAL rot_err {np.degrees(rot_err):.3f} deg (init {np.degrees(rot_err0):.3f}) "
      f"t_err {t_err:.4f} (init {np.linalg.norm(np.array([0.7,0.05,0.25])-t_true):.4f}) "
      f"ATE {rmse:.4f}")
