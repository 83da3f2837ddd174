"""Dump the exact inputs of the first biased window (t2≈0.6275, noise-free)
and dissect the match: which surfaces contribute the backward x-residuals?"""
import os
import sys
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np
import pickle

from limovelo_tpu.io.simulate import (corridor_trajectory, corridor_world,
                                      replay_into, simulate)
from limovelo_tpu.runtime.pipeline import LioPipeline

sys.path.insert(0, "tests")
from test_racing import racing_cfg, GRID_LONG

T_LO, T_HI = float(sys.argv[1]) if len(sys.argv) > 1 else 0.62, \
             float(sys.argv[2]) if len(sys.argv) > 2 else 0.64

cfg = racing_cfg()
traj = corridor_trajectory(speed=20.0, weave=0.3, ramp=1.5, hold=0.5)
world = corridor_world(length=180.0, width=8.0, pillar_every=6.0)
sim = simulate(world, traj, cfg, duration=1.2, lidar_lines=12,
               pts_per_line=200, imu_rate=400.0, seed=21,
               range_noise=0.0, accel_noise=0.0, gyro_noise=0.0)


class DumpPipe(LioPipeline):
    dumped = False

    def step_window(self, t1, t2):
        if not self.dumped and T_LO < t2 < T_HI:
            self.dumped = True
            rebase = self.accum.initial_time
            pts, pts_t = self.accum.get_points(t1, t2)
            imu_f = self.accum.get_imus(self.last_time_integrated, t2)
            imu_p = self.accum.get_imus(self.anchor_t, t2)
            nxt = self.accum.get_next_imu(self.anchor_t)
            state = {
                "t1": t1, "t2": t2, "rebase": rebase,
                "anchor_t": self.anchor_t,
                "anchor": jax.tree.map(np.asarray, self.anchor),
                "x": jax.tree.map(np.asarray, self.x),
                "P": np.asarray(self.P),
                "last_time_integrated": self.last_time_integrated,
                "pts": pts, "pts_t": pts_t,
                "imu_f": imu_f, "imu_p": imu_p,
                "anchor_a": nxt.a, "anchor_w": nxt.w,
                "map_keys": np.asarray(self.map.keys),
                "map_pts": np.asarray(self.map.pts),
                "map_d2": np.asarray(self.map.cell_d2),
            }
            with open("/tmp/window_dump.pkl", "wb") as f:
                pickle.dump(state, f)
            print(f"DUMPED window t1={t1:.4f} t2={t2:.4f}")
        return super().step_window(t1, t2)


pipe = DumpPipe(cfg, grid=GRID_LONG)
replay_into(pipe, sim, spin_every_imu=True)
print("records:", len(pipe.result.records))
