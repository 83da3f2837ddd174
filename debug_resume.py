"""Diagnose resume-equivalence divergence: log every dispatched window
(t1, t2, n raw pts, imu_f len, imu_p len, anchor_t LB) for run A vs run B."""

import numpy as np

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import circle_trajectory, room_world, simulate
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from limovelo_tpu.runtime.pipeline import LioPipeline

import tests.test_checkpoint as tc

GRID = tc.GRID
cfg = tc._cfg(mapping_online=True)

traj = circle_trajectory(radius=4.0, omega=0.4)
world = room_world(size=24.0, n_boxes=10)
sim = simulate(world, traj, cfg, duration=5.0, lidar_lines=12,
               pts_per_line=180, imu_rate=200.0, seed=7)
t_cut = 2.55

LOGS = {}


def make_logged(tag):
    logs = LOGS.setdefault(tag, [])

    class P(LioPipeline):
        def step_window(self, t1, t2):
            pts, pts_t, _ = self.accum.get_points(t1, t2)
            logs.append((t1, t2, len(pts), self.anchor_t,
                         self.last_time_updated, self.last_time_integrated))
            return super().step_window(t1, t2)

    return P


A = make_logged("A")(cfg, grid=GRID)
tc._feed(A, sim)
res_a = A.result

B1 = make_logged("B1")(cfg, grid=GRID)
tc._feed(B1, sim, t_stop=t_cut)
ck = "/tmp/ck_dbg.npz"
save_checkpoint(ck, B1)

B2 = make_logged("B2")(cfg, grid=GRID)
load_checkpoint(ck, B2)
tc._feed(B2, sim, t_start=t_cut)
res_b = B2.result

print("--- A windows near cut ---")
for w in LOGS["A"]:
    if 2.3 < w[1] < 2.8:
        print("A ", [f"{v:.4f}" if isinstance(v, float) else v for v in w])
print("--- B1 tail ---")
for w in LOGS["B1"][-4:]:
    print("B1", [f"{v:.4f}" if isinstance(v, float) else v for v in w])
print("--- B2 head ---")
for w in LOGS["B2"][:4]:
    print("B2", [f"{v:.4f}" if isinstance(v, float) else v for v in w])

ta, tb = res_a.times, res_b.times
post = tb > t_cut
for i in np.nonzero(post)[0][:5]:
    j = np.argmin(np.abs(ta - tb[i]))
    d = np.linalg.norm(res_b.positions[i] - res_a.positions[j])
    print(f"t={tb[i]:.4f}  |dp|={d:.5f}")

print("--- all B2 windows vs A ---")
for i in range(len(tb)):
    j = np.argmin(np.abs(ta - tb[i]))
    if abs(ta[j] - tb[i]) < 1e-6:
        d = np.linalg.norm(res_b.positions[i] - res_a.positions[j])
        print(f"t={tb[i]:.4f}  |dp|={d:.6f}")
