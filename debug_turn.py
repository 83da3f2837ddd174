"""100 deg/s turn at 20 m/s (tests/test_racing.py scenario) — seedable ATE.
Usage: SEED=22 python debug_turn.py"""
import os

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import sys

import numpy as np

sys.path.insert(0, "tests")
from test_racing import GRID_LONG, racing_cfg

from limovelo_tpu.io.simulate import (circle_trajectory, replay_into,
                                      room_world, simulate)
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline

seed = int(os.environ.get("SEED", 22))
cfg = racing_cfg()
omega = np.deg2rad(100.0)
traj = circle_trajectory(radius=20.0 / omega, omega=omega, ramp=1.5, hold=0.5)
world = room_world(size=56.0, n_boxes=16, seed=4)
sim = simulate(world, traj, cfg, duration=6.0, lidar_lines=12,
               pts_per_line=220, imu_rate=400.0, seed=seed)
pipe = LioPipeline(cfg, grid=GRID_LONG)
replay_into(pipe, sim, spin_every_imu=True)
res = pipe.result
rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
print(f"turn seed={seed}: ATE={rmse:.4f} records={len(res.records)}", flush=True)
