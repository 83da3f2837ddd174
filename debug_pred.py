"""Instrument the PRE-update prediction: hijack eigenvalue telemetry with
push vector, x_pred (pos/vel), and the anchor-path end state, to locate where
the backward pull during the ramp originates."""
import os
import sys
flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax
jax.config.update("jax_platforms", "cpu")

import jax.numpy as jnp
import numpy as np

import limovelo_tpu.step as step_mod
from limovelo_tpu.filter.update import iterated_update as orig_update, _match
from limovelo_tpu.filter.process import predict_window
from limovelo_tpu.deskew.compensate import build_path, state_at
from limovelo_tpu.step import make_telemetry


def patched_update(x0, P, m, pts, mask, grid, static_cfg, dyn, axis_name=None, knn_fn=None):
    x, P_new, diag = orig_update(x0, P, m, pts, mask, grid, static_cfg, dyn,
                                 axis_name=axis_name, knn_fn=knn_fn)
    r, fit, valid = _match(x, m, pts, mask, grid, static_cfg, dyn, knn_fn)
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    push = jnp.sum(fit.normal * (r * w)[:, None], axis=0) / n
    eig = diag.eigenvalues.at[:3].set(push)
    return x, P_new, diag._replace(eigenvalues=eig)


step_mod.iterated_update = patched_update
orig_core = step_mod._lio_step_core


def core2(inp, m, static_cfg, grid):
    out = orig_core(inp, m, static_cfg, grid)
    x_pred, _ = predict_window(inp.x, inp.P, inp.imus_filter, inp.t_integrated, inp.Q)
    path = build_path(inp.anchor, inp.anchor_t, inp.anchor_a, inp.anchor_w, inp.imus_path)
    Rp, pp, vp = state_at(path, inp.anchor, inp.t2)
    eig = out.diag.eigenvalues
    eig = eig.at[3].set(inp.t2)
    eig = eig.at[4:7].set(x_pred.p)
    eig = eig.at[7:10].set(x_pred.v)
    eig = eig.at[10].set(pp[0]).at[11].set(vp[0])
    diag = out.diag._replace(eigenvalues=eig)
    tel = make_telemetry(out.updated, out.ds_count, diag, out.x, out.map)
    return out._replace(diag=diag, telemetry=tel)


step_mod._lio_step_core = core2
from functools import partial

# rebuild the packed entry so it traces core2
import limovelo_tpu.runtime.pipeline as pl


from limovelo_tpu.filter.process import ImuWindow

_HDR = step_mod._HDR


@partial(jax.jit, static_argnames=("n_pts", "n_imu_f", "n_imu_p", "static_cfg", "grid"),
         donate_argnums=(5,))
def packed2(packed, x, P, anchor, Q, m, dyn, n_pts, n_imu_f, n_imu_p, static_cfg, grid):
    B = n_pts
    imus_f, off = step_mod._unpack_imus(packed, _HDR, n_imu_f)
    imus_p, off = step_mod._unpack_imus(packed, off, n_imu_p)
    pts = jax.lax.dynamic_slice_in_dim(packed, off, 3 * B).reshape(B, 3)
    pts_t = jax.lax.dynamic_slice_in_dim(packed, off + 3 * B, B)
    pts_mask = jax.lax.dynamic_slice_in_dim(packed, off + 4 * B, B) > 0.5
    inp = step_mod.StepInputs(
        anchor=anchor, anchor_t=packed[0], anchor_a=packed[3:6], anchor_w=packed[6:9],
        x=x, P=P, t_integrated=packed[1], imus_filter=imus_f, imus_path=imus_p,
        pts=pts, pts_t=pts_t, pts_mask=pts_mask, t2=packed[2], Q=Q, dyn=dyn,
    )
    return core2(inp, m, static_cfg, grid)


pl.lio_step_packed = packed2

from limovelo_tpu.io.simulate import (corridor_trajectory, corridor_world,
                                      replay_into, simulate)
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline

sys.path.insert(0, "tests")
from test_racing import racing_cfg, GRID_LONG

noise = float(sys.argv[1]) if len(sys.argv) > 1 else 0.0
duration = float(sys.argv[2]) if len(sys.argv) > 2 else 3.0

cfg = racing_cfg()
traj = corridor_trajectory(speed=20.0, weave=0.3, ramp=1.5, hold=0.5)
world = corridor_world(length=180.0, width=8.0, pillar_every=6.0)
sim = simulate(world, traj, cfg, duration=duration, lidar_lines=12,
               pts_per_line=200, imu_rate=400.0, seed=21,
               range_noise=0.01 * noise, accel_noise=0.02 * noise,
               gyro_noise=0.002 * noise)

pipe = LioPipeline(cfg, grid=GRID_LONG)
replay_into(pipe, sim, spin_every_imu=True)
res = pipe.result
rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
print(f"noise={noise} records={len(res.records)} ATE={rmse:.4f}")


def gt_pv(t):
    eps = 1e-4
    _, p = traj.pose(t)
    v = (traj.pose(t + eps)[1] - traj.pose(t - eps)[1]) / (2 * eps)
    return p, v


rebase = pipe.accum.initial_time
for i, r in enumerate(res.records):
    eig = r.eigenvalues
    t2 = float(eig[3]) + rebase
    gp, gv = gt_pv(t2)
    pred_ex = eig[4] - gp[0]
    pred_evx = eig[7] - gv[0]
    path_ex = eig[10] - gp[0]
    path_evx = eig[11] - gv[0]
    post_ex = r.p[0] - gp[0]
    if i % 4 == 0 or 0.55 < t2 < 1.3:
        print(f"t={t2:6.3f} push_x={eig[0]*1000:7.2f}mm predEx={pred_ex*1000:8.2f} "
              f"pathEx={path_ex*1000:8.2f} postEx={post_ex*1000:8.2f} "
              f"predEvx={pred_evx*1000:7.1f}mm/s pathEvx={path_evx*1000:7.1f} m={r.num_matches}")
