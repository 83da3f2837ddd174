"""Micro-bisect the LIO step on the real device: which component regressed?"""
import sys
import time

import numpy as np


def timeit(fn, *args, reps=20):
    import jax

    out = fn(*args)
    jax.block_until_ready(out)
    lat = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        jax.block_until_ready(out)
        lat.append(time.perf_counter() - t0)
    return float(np.percentile(lat, 50)) * 1e3


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from limovelo_tpu import Config
    from limovelo_tpu.config import DynParams
    from limovelo_tpu.filter.process import ImuWindow, predict_window, process_noise_Q
    from limovelo_tpu.filter.update import _match, iterated_update
    from limovelo_tpu.geometry import state as st
    from limovelo_tpu.mapping import GridParams, insert, knn, make_map
    from limovelo_tpu.ops.planes import fit_planes
    from limovelo_tpu.ops.voxel import voxel_downsample

    config = Config(real_time=True, min_dist=0.5, downsample_prec=0.5,
                    map_table_size=1 << 17)
    grid = GridParams.from_config(config)
    static = config.static()
    dyn = DynParams.from_config(config)
    rng = np.random.default_rng(0)

    m = make_map(grid)
    n_map = 200_000
    ground = np.stack([rng.uniform(-60, 60, n_map // 2),
                       rng.uniform(-60, 60, n_map // 2),
                       rng.normal(0, 0.02, n_map // 2)], 1)
    walls = np.stack([rng.uniform(-60, 60, n_map // 2),
                      np.where(rng.random(n_map // 2) < 0.5, -6.0, 6.0),
                      rng.uniform(0, 4, n_map // 2)], 1)
    mp = np.concatenate([ground, walls]).astype(np.float32)
    for i in range(0, n_map, 16384):
        c = mp[i:i + 16384]
        pad = np.zeros((16384, 3), np.float32); pad[:len(c)] = c
        msk = np.zeros(16384, bool); msk[:len(c)] = True
        m = insert(m, jnp.asarray(pad), jnp.asarray(msk), grid)

    N = 2048
    az = rng.uniform(0, 2 * np.pi, N)
    el = np.deg2rad(rng.uniform(-15, 15, N))
    r = rng.uniform(3, 40, N)
    q = np.stack([np.cos(el) * np.cos(az) * r, np.cos(el) * np.sin(az) * r,
                  0 * r], 1).astype(np.float32)
    queries = jnp.asarray(q)
    mask = jnp.ones(N, bool)

    x = st.make_initial(config)
    x = st.boxplus(x, jnp.asarray(np.r_[0., 0., 1.5, np.zeros(20)], jnp.float32))
    P = st.initial_covariance()

    # 1. KNN production envelope
    f = jax.jit(lambda mm, qq: knn(mm, qq, grid, k=5, rings=static.knn_rings,
                                   max_buckets=static.knn_max_buckets))
    print(f"knn rings={static.knn_rings} tiered={static.knn_max_buckets}: "
          f"{timeit(f, m, queries):8.3f} ms")

    # 2. plane fit alone
    nb, sq, nbv = f(m, queries)
    g = jax.jit(lambda a, b, c: fit_planes(a, b, c, 2.0, 0.1))
    print(f"fit_planes:          {timeit(g, nb, sq, nbv):8.3f} ms")

    # 3. voxel downsample
    h = jax.jit(lambda p, msk: voxel_downsample(p, msk, 0.5))
    print(f"voxel_downsample:    {timeit(h, queries, mask):8.3f} ms")

    # 4. one full match.  NOTE: `dyn` (device scalars) MUST be an explicit
    # argument — a lambda closing over device arrays permanently degrades
    # this environment's tunneled runtime (BENCH.md r03 pathology note).
    mt = jax.jit(lambda xx, mm, qq, msk, dd: _match(xx, mm, qq, msk, grid, static, dd))
    print(f"_match (1 pass):     {timeit(mt, x, m, queries, mask, dyn):8.3f} ms")

    # 5. iterated update (GN passes + P+)
    up = jax.jit(lambda xx, PP, mm, qq, msk, dd: iterated_update(
        xx, PP, mm, qq, msk, grid, static, dd))
    print(f"iterated_update:     {timeit(up, x, P, m, queries, mask, dyn):8.3f} ms")

    # 6. predict over 16 IMUs
    ts = ((np.arange(16) + 1) * (0.01 / 16)).astype(np.float32)
    imus = ImuWindow(jnp.asarray(ts),
                     jnp.tile(jnp.asarray(-np.array(config.gravity_vec, np.float32)), (16, 1)),
                     jnp.zeros((16, 3), jnp.float32), jnp.ones(16, bool))
    Q = process_noise_Q(config)
    pr = jax.jit(lambda xx, PP, ii, QQ: predict_window(xx, PP, ii, 0.0, QQ))
    print(f"predict (16 imus):   {timeit(pr, x, P, imus, Q):8.3f} ms")

    # 7. map insert
    ins = jax.jit(lambda mm, qq, msk: insert(mm, qq, msk, grid))
    print(f"insert 2048:         {timeit(ins, m, queries, mask):8.3f} ms")


if __name__ == "__main__":
    main()
