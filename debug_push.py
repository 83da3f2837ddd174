"""Instrumented run: hijack eigenvalue telemetry to carry the mean residual
push vector (mean r·n over matches) at the final GN iterate — shows WHICH
direction matching pushes the state during the ramp transient."""
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

def patched_update(x0, P, m, pts, mask, grid, static_cfg, dyn, axis_name=None, knn_fn=None):
    x, P_new, diag = orig_update(x0, P, m, pts, mask, grid, static_cfg, dyn,
                                 axis_name=axis_name, knn_fn=knn_fn)
    r, fit, valid = _match(x, m, pts, mask, grid, static_cfg, dyn, knn_fn)
    w = valid.astype(pts.dtype)
    n = jnp.maximum(jnp.sum(w), 1.0)
    push = jnp.sum(fit.normal * (r * w)[:, None], axis=0) / n      # (3,)
    signed = jnp.sum(r * w) / n
    eig = diag.eigenvalues.at[:3].set(push).at[3].set(signed)
    return x, P_new, diag._replace(eigenvalues=eig)

step_mod.iterated_update = patched_update

from limovelo_tpu.io.simulate import (corridor_trajectory, corridor_world,
                                      replay_into, simulate)
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline

sys.path.insert(0, "tests")
from test_racing import racing_cfg, GRID_LONG

ramp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
noise = float(sys.argv[2]) if len(sys.argv) > 2 else 0.0
duration = float(sys.argv[3]) if len(sys.argv) > 3 else 5.0

cfg = racing_cfg()
traj = corridor_trajectory(speed=20.0, weave=0.3, ramp=ramp, hold=0.5)
world = corridor_world(length=180.0, width=8.0, pillar_every=6.0)
sim = simulate(world, traj, cfg, duration=duration, lidar_lines=12,
               pts_per_line=200, imu_rate=400.0, seed=21,
               range_noise=0.01 * noise, accel_noise=0.02 * noise,
               gyro_noise=0.002 * noise)

pipe = LioPipeline(cfg, grid=GRID_LONG)
replay_into(pipe, sim, spin_every_imu=True)
res = pipe.result
rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
print(f"ramp={ramp} noise={noise} records={len(res.records)} ATE={rmse:.4f}")
gt_p = np.stack([np.interp(res.times, sim.gt_t, sim.gt_p[:, i]) for i in range(3)], -1)
err = res.positions - gt_p
for i in range(0, len(res.records), max(1, len(res.records) // 60)):
    r = res.records[i]
    push = r.eigenvalues[:3]
    print(f"t={r.t:6.3f} ex={err[i,0]:7.3f} ez={err[i,2]:6.3f} "
          f"push=({push[0]:8.5f},{push[1]:8.5f},{push[2]:8.5f}) "
          f"signed={r.eigenvalues[3]:8.5f} m={r.num_matches:4d} it={r.iterations}")
