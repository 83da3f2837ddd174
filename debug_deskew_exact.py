"""Deskew accuracy vs TRUE world geometry, no estimator in the loop.

Builds the 20 m/s ramp sim noise-free, picks windows during the ramp, deskews
with a GROUND-TRUTH anchor + the sim's own IMU samples, places the cloud with
the TRUE pose at t2, and measures each point's distance to the nearest true
surface.  A perfect deskew puts every point on a surface."""
import os
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")

import numpy as np
import jax.numpy as jnp
from scipy.spatial.transform import Rotation as Rsc

import sys
sys.path.insert(0, "tests")
from test_racing import racing_cfg

from limovelo_tpu.deskew.compensate import build_path, compensate, state_at
from limovelo_tpu.filter.process import ImuWindow
from limovelo_tpu.geometry.state import NavState
from limovelo_tpu.io.simulate import corridor_trajectory, corridor_world, simulate

cfg = racing_cfg()
traj = corridor_trajectory(speed=20.0, weave=0.3, ramp=1.5, hold=0.5)
world = corridor_world(length=180.0, width=8.0, pillar_every=6.0)
sim = simulate(world, traj, cfg, duration=3.0, lidar_lines=12,
               pts_per_line=200, imu_rate=400.0, seed=21,
               range_noise=0.0, accel_noise=0.0, gyro_noise=0.0)

# surface distance: corridor planes + pillar boxes (mirror corridor_world)
length, width, height, pillar_every = 180.0, 8.0, 4.0, 6.0
planes = [
    (np.array([0.0, 0.0, 1.0]), 0.0),
    (np.array([0.0, 0.0, -1.0]), height),
    (np.array([0.0, 1.0, 0.0]), width / 2),
    (np.array([0.0, -1.0, 0.0]), width / 2),
    (np.array([1.0, 0.0, 0.0]), 10.0),
    (np.array([-1.0, 0.0, 0.0]), length),
]
boxes = []
x, side = 0.0, 1.0
while x < length:
    y = side * (width / 2 - 0.3)
    boxes.append((np.array([x, y, height / 2]), np.array([0.3, 0.3, height / 2])))
    side = -side
    x += pillar_every


def surf_dist(q):
    d = np.min(np.stack([np.abs(q @ n + off) for n, off in planes]), axis=0)
    for c, half in boxes:
        # distance to box surface (outside: to AABB; inside: negative margin)
        dd = np.abs(q - c) - half
        outside = np.linalg.norm(np.maximum(dd, 0.0), axis=1)
        inside = np.max(dd, axis=1)
        box_d = np.where(inside < 0, -inside, outside)
        d = np.minimum(d, box_d)
    return d


def truth_state(t):
    R_b, p_b = traj.pose(t)
    # velocity by central difference
    eps = 1e-4
    v = (traj.pose(t + eps)[1] - traj.pose(t - eps)[1]) / (2 * eps)
    g = np.array(cfg.gravity_vec)
    R_LI = np.array(cfg.I_Rotation_L).reshape(3, 3)
    return NavState(
        R=jnp.asarray(R_b, jnp.float32), p=jnp.asarray(p_b, jnp.float32),
        v=jnp.asarray(v, jnp.float32), bg=jnp.zeros(3), ba=jnp.zeros(3),
        g=jnp.asarray(g, jnp.float32),
        R_LI=jnp.asarray(R_LI, jnp.float32),
        t_LI=jnp.asarray(cfg.I_Translation_L, jnp.float32),
    )


all_pts = np.concatenate([s.pts for s in sim.scans])
all_t = np.concatenate([s.t for s in sim.scans])

for (t1, t2) in [(0.60, 0.70), (0.65, 0.70), (0.90, 0.95), (1.50, 1.52),
                 (2.50, 2.52), (2.40, 2.50)]:
    sel = (all_t > t1) & (all_t <= t2)
    pts = all_pts[sel]
    ts = all_t[sel].astype(np.float32)
    if len(pts) == 0:
        print(f"[{t1},{t2}] no points")
        continue
    anchor = truth_state(t1)
    im_sel = (sim.imu_t > t1) & (sim.imu_t <= t2)
    its = sim.imu_t[im_sel].astype(np.float32)
    ias = sim.imu_a[im_sel]
    iws = sim.imu_w[im_sel]
    if len(its) == 0 or its[-1] < t2:
        its = np.append(its, np.float32(t2))
        ias = np.vstack([ias, ias[-1] if len(ias) else np.zeros(3)])
        iws = np.vstack([iws, iws[-1] if len(iws) else np.zeros(3)])
    win = ImuWindow(jnp.asarray(its), jnp.asarray(ias), jnp.asarray(iws),
                    jnp.ones(len(its), bool))
    nxt_i = np.argmax(sim.imu_t > t1)
    a0, w0 = sim.imu_a[nxt_i], sim.imu_w[nxt_i]
    path = build_path(anchor, np.float32(t1), jnp.asarray(a0), jnp.asarray(w0), win)
    out = np.asarray(compensate(path, anchor, np.float32(t2), jnp.asarray(pts),
                                jnp.asarray(ts), jnp.ones(len(pts), bool)))
    # place with TRUE pose at t2
    R_b, p_b = traj.pose(t2)
    R_LI = np.array(cfg.I_Rotation_L).reshape(3, 3)
    R_wl = R_b @ R_LI
    p_wl = R_b @ np.array(cfg.I_Translation_L) + p_b
    q = out @ R_wl.T + p_wl
    d = surf_dist(q)
    # raw (no deskew) comparison
    q_raw = pts @ R_wl.T + p_wl
    d_raw = surf_dist(q_raw)
    # x-offset on pillar-face points: points whose nearest surface is a box
    print(f"[{t1:4.2f},{t2:4.2f}] n={len(pts):5d} deskewed: mean={d.mean()*1000:7.2f}mm "
          f"p95={np.percentile(d,95)*1000:7.2f}mm max={d.max()*1000:7.2f}mm | "
          f"raw: mean={d_raw.mean()*1000:7.2f}mm p95={np.percentile(d_raw,95)*1000:7.2f}mm")
    # also check state_at(t2) against truth
    R2, p2, v2 = state_at(path, anchor, np.float32(t2))
    print(f"        state_at(t2) pos err={np.linalg.norm(np.asarray(p2)-p_b)*1000:.2f}mm "
          f"vel err={np.linalg.norm(np.asarray(v2)-truth_state(t2).v):.4f}m/s")
