"""Debug harness for the 20 m/s straight scenario (tests/test_racing.py).

Usage: python debug_straight.py [ramp] [noise_scale] [duration]
"""
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
from limovelo_tpu import Config
from limovelo_tpu.io.simulate import (corridor_trajectory, corridor_world,
                                      replay_into, simulate)
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline

sys.path.insert(0, "tests")
from test_racing import racing_cfg, GRID_LONG

ramp = float(sys.argv[1]) if len(sys.argv) > 1 else 1.5
noise = float(sys.argv[2]) if len(sys.argv) > 2 else 1.0
duration = float(sys.argv[3]) if len(sys.argv) > 3 else 8.0

extra = sys.argv[5] if len(sys.argv) > 5 else ""
kw = {}
if "fastinit" in extra:
    from limovelo_tpu.config import InitializationParams
    kw["Initialization"] = InitializationParams(times=(), deltas=(0.02,))
for tok in extra.split(","):
    if tok.startswith("plane="):
        kw["PLANES_THRESHOLD"] = float(tok[6:])
    elif tok.startswith("deg="):
        kw["degeneracy_threshold"] = float(tok[4:])
    elif tok.startswith("mind="):
        kw["min_dist"] = float(tok[5:])
    elif tok.startswith("dsp="):
        kw["downsample_prec"] = float(tok[4:])
cfg = racing_cfg(**kw)
hold = float(sys.argv[4]) if len(sys.argv) > 4 else 0.5
traj = corridor_trajectory(speed=20.0, weave=0.3, ramp=ramp, hold=hold)
world = corridor_world(length=180.0, width=8.0, pillar_every=6.0)
ppl = int(kw.pop("_ppl", 200)) if "_ppl" in kw else 200
for tok in extra.split(","):
    if tok.startswith("ppl="):
        ppl = int(tok[4:])
sim = simulate(world, traj, cfg, duration=duration, lidar_lines=12,
               pts_per_line=ppl, imu_rate=400.0, seed=int(os.environ.get("SEED", 21)),
               range_noise=0.01 * noise, accel_noise=0.02 * noise,
               gyro_noise=0.002 * noise)


class DebugPipe(LioPipeline):
    biases = []

    def _on_record(self, rec):
        ba, bg, g = jax.device_get((self.x.ba, self.x.bg, self.x.g))
        self.biases.append((rec.t, np.asarray(ba), np.asarray(bg), np.asarray(g)))


pipe = DebugPipe(cfg, grid=GRID_LONG)
replay_into(pipe, sim, spin_every_imu=True)
res = pipe.result
rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R, sim.gt_p)
print(f"ramp={ramp} noise={noise} records={len(res.records)} ATE={rmse:.4f}")

# per-step error vs interpolated GT
gt_p = np.stack([np.interp(res.times, sim.gt_t, sim.gt_p[:, i]) for i in range(3)], -1)
err = res.positions - gt_p
# GT velocity by finite difference of the dense GT
gt_v = np.gradient(sim.gt_p, sim.gt_t, axis=0)
gt_v_i = np.stack([np.interp(res.times, sim.gt_t, gt_v[:, i]) for i in range(3)], -1)

bias_by_t = {t: (ba, bg, g) for t, ba, bg, g in pipe.biases}
for i in range(0, len(res.records), max(1, len(res.records) // 40)):
    r = res.records[i]
    ba, bg, g = bias_by_t.get(r.t, (np.zeros(3), np.zeros(3), np.zeros(3)))
    dv = r.v - gt_v_i[i]
    print(f"t={r.t:6.3f} ex={err[i,0]:7.3f} ey={err[i,1]:6.3f} ez={err[i,2]:6.3f} "
          f"dvx={dv[0]:6.3f} dvy={dv[1]:6.3f} dvz={dv[2]:6.3f} "
          f"bax={ba[0]:7.4f} baz={ba[2]:7.4f} bgy={bg[1]:8.5f} "
          f"gz={g[2]:8.4f} m={r.num_matches:4d} res={r.mean_residual:7.4f}")
print(f"FINAL ATE={rmse:.4f}")
