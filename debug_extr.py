"""Debug the online-extrinsics scenario: watch the estimate evolve."""
import os
import sys
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_compilation_cache_dir", "/tmp/jax_cache_cpu")
jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)

import numpy as np
from scipy.spatial.transform import Rotation as Rsc

from limovelo_tpu.io.simulate import circle_trajectory, replay_into, room_world, simulate
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline

sys.path.insert(0, "tests")
from test_racing import racing_cfg, GRID

sway = float(sys.argv[1]) if len(sys.argv) > 1 else 0.05
dur = float(sys.argv[2]) if len(sys.argv) > 2 else 8.0

R_true = Rsc.from_euler("xyz", [0.0, 0.01, 0.02]).as_matrix()
t_true = np.array([0.8, 0.0, 0.3])
mode = sys.argv[3] if len(sys.argv) > 3 else ""
priors = {}
if mode == "wide":
    priors = {"initial_cov_extrinsic_rot": 1e-3, "initial_cov_extrinsic_trans": 1e-2}
elif mode == "tw":
    priors = {"initial_cov_extrinsic_trans": 1e-3}
elif mode == "tw2":
    priors = {"initial_cov_extrinsic_trans": 1e-4}
cfg = racing_cfg(
    estimate_extrinsics=True,
    I_Rotation_L=tuple(np.eye(3).ravel()),
    I_Translation_L=(0.7, 0.05, 0.25),
    real_time=False,
    **priors,
)
omega = 0.6
traj = circle_trajectory(radius=5.0, omega=omega, ramp=1.0, hold=0.5, sway=sway)
world = room_world(size=26.0, n_boxes=12, seed=6)
sim = simulate(world, traj, cfg, duration=dur, lidar_lines=12,
               pts_per_line=200, imu_rate=400.0, seed=23,
               extrinsics=(R_true, t_true))
pipe = LioPipeline(cfg, grid=GRID)
replay_into(pipe, sim)
res = pipe.result
rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
print(f"sway={sway} records={len(res.records)} ATE={rmse:.4f}")
for i in range(0, len(res.records), max(1, len(res.records) // 30)):
    r = res.records[i]
    R_est = Rsc.from_rotvec(r.extr_rotvec).as_matrix()
    rot_err = np.degrees(np.linalg.norm(Rsc.from_matrix(R_est.T @ R_true).as_rotvec()))
    t_err = np.linalg.norm(r.extr_t - t_true)
    print(f"t={r.t:6.3f} rot_err={rot_err:6.3f}° t_err={t_err:6.4f} "
          f"extr_t=({r.extr_t[0]:6.3f},{r.extr_t[1]:6.3f},{r.extr_t[2]:6.3f}) "
          f"m={r.num_matches:4d} res={r.mean_residual:7.4f} it={r.iterations}")
last = res.records[-1]
R_est = Rsc.from_rotvec(last.extr_rotvec).as_matrix()
print(f"FINAL rot_err={np.degrees(np.linalg.norm(Rsc.from_matrix(R_est.T @ R_true).as_rotvec())):.3f}° "
      f"(init 1.281°) t_err={np.linalg.norm(last.extr_t - t_true):.4f} (init 0.1225)")
