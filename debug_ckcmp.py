import numpy as np
from limovelo_tpu.runtime.checkpoint import load_checkpoint, save_checkpoint
from limovelo_tpu.runtime.pipeline import LioPipeline
import tests.test_checkpoint as tc
from limovelo_tpu.io.simulate import circle_trajectory, room_world, simulate

cfg = tc._cfg(mapping_online=True)
traj = circle_trajectory(radius=4.0, omega=0.4)
world = room_world(size=24.0, n_boxes=10)
sim = simulate(world, traj, cfg, duration=5.0, lidar_lines=12, pts_per_line=180, imu_rate=200.0, seed=7)
B1 = LioPipeline(cfg, grid=tc.GRID)
tc._feed(B1, sim, t_stop=2.55)
save_checkpoint("/tmp/ck2.npz", B1)
B2 = LioPipeline(cfg, grid=tc.GRID)
load_checkpoint("/tmp/ck2.npz", B2)

def cmp(name, a, b):
    a, b = np.asarray(a), np.asarray(b)
    eq = np.array_equal(a, b, equal_nan=True)
    if not eq:
        d = np.max(np.abs(np.nan_to_num(a - b)))
        print(f"DIFF {name}: maxabs={d}")
    else:
        print(f"ok   {name}")

for f in ("R","p","v","bg","ba","g","R_LI","t_LI"):
    cmp("x."+f, getattr(B1.x, f), getattr(B2.x, f))
    cmp("anchor."+f, getattr(B1.anchor, f), getattr(B2.anchor, f))
cmp("P", B1.P, B2.P)
cmp("anchor_t_dev", B1.anchor_t_dev, B2.anchor_t_dev)
print("anchor_t", B1.anchor_t, B2.anchor_t)
print("lwu", B1.last_time_updated, B2.last_time_updated)
print("lti", B1.last_time_integrated, B2.last_time_integrated)
print("t2", B1.t2, B2.t2, "lmt", B1.last_map_time, B2.last_map_time)
print("initial_time", B1.accum.initial_time, B2.accum.initial_time)
for f in ("keys","pts","cell_d2","num_points","num_buckets"):
    cmp("map."+f, getattr(B1.map, f), getattr(B2.map, f))
print("anchors", len(B1._anchors), len(B2._anchors))
p1 = B1.accum.get_points(0, 99); p2 = B2.accum.get_points(0, 99)
cmp("acc.pts", p1[0], p2[0]); cmp("acc.t", p1[1], p2[1])
i1 = B1.accum.get_imus(0, 99); i2 = B2.accum.get_imus(0, 99)
cmp("acc.imu_t", i1[0], i2[0]); cmp("acc.imu_a", i1[1], i2[1])
