"""Benchmark: sustained LIO update rate on one chip.

Measures the p50 latency of the full jitted LIO step (predict + deskew +
downsample + 3-iteration point-to-plane update + map insert) at a realistic
window size against a populated map, and reports achieved state-update rate.

Baseline: the reference's headline 100 Hz localization rate (delta = 0.01 s,
README.md:13-15, BASELINE.md) on a desktop CPU.  vs_baseline = achieved_hz/100.
"""

import json
import time

import numpy as np


def main():
    import os
    import sys

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from limovelo_tpu import Config
    from limovelo_tpu.filter.process import ImuWindow, process_noise_Q
    from limovelo_tpu.geometry import state as st
    from limovelo_tpu.mapping import GridParams, insert, make_map
    from limovelo_tpu.step import StepInputs, lio_step

    config = Config(
        real_time=True,
        min_dist=0.5,
        downsample_prec=0.5,
        map_table_size=1 << 17,
    )
    grid = GridParams.from_config(config)
    rng = np.random.default_rng(0)

    # --- build a populated map: planar world sampling (~walls/ground) ---
    m = make_map(grid)
    n_map = 200_000
    ground = np.stack(
        [rng.uniform(-60, 60, n_map // 2), rng.uniform(-60, 60, n_map // 2),
         rng.normal(0, 0.02, n_map // 2)], axis=1
    )
    walls = np.stack(
        [rng.uniform(-60, 60, n_map // 2),
         np.where(rng.random(n_map // 2) < 0.5, -6.0, 6.0) + rng.normal(0, 0.02, n_map // 2),
         rng.uniform(0, 4, n_map // 2)], axis=1
    )
    map_pts = np.concatenate([ground, walls]).astype(np.float32)
    for i in range(0, n_map, 16384):
        chunk = map_pts[i : i + 16384]
        pad = np.zeros((16384, 3), np.float32)
        pad[: len(chunk)] = chunk
        msk = np.zeros(16384, bool)
        msk[: len(chunk)] = True
        m = insert(m, jnp.asarray(pad), jnp.asarray(msk), grid)

    # --- representative 100 Hz window: delta=0.01 s slice of a spinning scan ---
    n_pts = 2048
    n_imu = 16
    x = st.make_initial(config)
    x = st.boxplus(x, jnp.asarray(np.r_[0.0, 0.0, 1.5, np.zeros(20)], jnp.float32))
    P = st.initial_covariance()
    az = rng.uniform(0, 2 * np.pi, n_pts)
    elev = np.deg2rad(rng.uniform(-15, 15, n_pts))
    # rays hitting ground/walls from 1.5m height (ranges 3-40m)
    r = rng.uniform(3, 40, n_pts)
    pts = np.stack(
        [np.cos(elev) * np.cos(az) * r, np.cos(elev) * np.sin(az) * r, -1.5 + 0.0 * r],
        axis=1,
    ).astype(np.float32)
    ts = ((np.arange(n_imu) + 1) * (0.01 / n_imu)).astype(np.float32)
    imus = ImuWindow(
        t=jnp.asarray(ts),
        a=jnp.asarray(np.tile(-np.array(config.gravity_vec, np.float32), (n_imu, 1))),
        w=jnp.zeros((n_imu, 3), jnp.float32),
        mask=jnp.ones(n_imu, bool),
    )
    from limovelo_tpu.config import DynParams

    inp = StepInputs(
        anchor=x, anchor_t=jnp.float32(0.0),
        anchor_a=jnp.asarray(-np.array(config.gravity_vec, np.float32)),
        anchor_w=jnp.zeros(3, jnp.float32),
        x=x, P=P, t_integrated=jnp.float32(0.0),
        imus_filter=imus, imus_path=imus,
        pts=jnp.asarray(pts),
        pts_t=jnp.asarray(rng.uniform(0, 0.01, n_pts).astype(np.float32)),
        pts_mask=jnp.ones(n_pts, bool),
        t2=jnp.float32(0.01),
        Q=process_noise_Q(config),
        dyn=DynParams.from_config(config),
    )

    static_cfg = config.static()
    # warm up (compile)
    out = lio_step(inp, m, static_cfg, grid)
    jax.block_until_ready(out.x)
    m = out.map

    # timed runs — donation means we must rebuild map arg each call from the
    # previous output (steady-state pattern of the real pipeline)
    lat = []
    for _ in range(50):
        t0 = time.perf_counter()
        out = lio_step(inp, m, static_cfg, grid)
        jax.block_until_ready(out.x)
        lat.append(time.perf_counter() - t0)
        m = out.map
    p50 = float(np.percentile(lat, 50))
    hz = 1.0 / p50

    print(
        json.dumps(
            {
                "metric": "lio_update_rate",
                "value": round(hz, 2),
                "unit": "Hz",
                "vs_baseline": round(hz / 100.0, 3),
            }
        )
    )


if __name__ == "__main__":
    main()
