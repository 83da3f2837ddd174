"""Settle the Pallas KNN question (VERDICT r2 #9): measure `knn_grouped`
against the XLA `mapping.knn` in the kernel's SELF-IDENTIFIED winning regime
— raw, NON-downsampled full-rotation clouds (~16-64 queries per coarse
voxel) — on the real device.  Run manually; records the number for
ops/pallas/knn.py's STATUS note and BENCH.md."""

import sys
import time

import numpy as np


def main():
    import os

    sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))
    from __graft_entry__ import _enable_compile_cache

    _enable_compile_cache()
    import jax
    import jax.numpy as jnp

    from limovelo_tpu import Config
    from limovelo_tpu.io.simulate import corridor_trajectory, corridor_world, simulate
    from limovelo_tpu.mapping import GridParams, insert, knn, make_map
    from limovelo_tpu.ops.pallas.knn import knn_grouped

    cfg = Config(real_time=False, min_dist=0.5, full_rotation_time=0.1)
    grid = GridParams(table_size=1 << 16, coarse_factor=4, voxel_size=0.2,
                      probe_length=8)

    # a raw full rotation: dense scan of the corridor, NOT voxel-downsampled
    traj = corridor_trajectory(speed=5.0)
    world = corridor_world(length=60.0, width=8.0, pillar_every=6.0)
    sim = simulate(world, traj, cfg, duration=1.0, lidar_lines=16,
                   pts_per_line=512, imu_rate=200.0, seed=3)
    raw = np.concatenate([s.pts for s in sim.scans])          # sensor frame
    # place roughly in world (identity pose suffices for a KNN benchmark)
    queries_np = raw.astype(np.float32)
    N = 8192
    q = np.zeros((N, 3), np.float32)
    take = min(len(queries_np), N)
    q[:take] = queries_np[:take]
    queries = jnp.asarray(q)

    m = make_map(grid)
    for i in range(0, take, 8192):
        chunk = queries_np[i:i + 8192]
        pad = np.zeros((8192, 3), np.float32)
        pad[: len(chunk)] = chunk
        msk = np.zeros(8192, bool)
        msk[: len(chunk)] = True
        m = insert(m, jnp.asarray(pad), jnp.asarray(msk), grid)

    vox = np.unique(np.floor(queries_np[:take] / grid.coarse_size).astype(np.int64), axis=0)
    print(f"raw full-rotation regime: {take} queries over {len(vox)} coarse "
          f"voxels -> {take/len(vox):.1f} queries/voxel")

    # XLA baseline (rings=1 to match the kernel's envelope)
    knn_jit = jax.jit(lambda mm, qq: knn(mm, qq, grid, k=5, rings=1))
    nb0, sq0, v0 = knn_jit(m, queries)
    jax.block_until_ready(sq0)
    lat = []
    for _ in range(30):
        t0 = time.perf_counter()
        out = knn_jit(m, queries)
        jax.block_until_ready(out[1])
        lat.append(time.perf_counter() - t0)
    xla_ms = float(np.percentile(lat, 50)) * 1e3

    # Pallas kernel
    try:
        g_max = 1400
        pallas_jit = jax.jit(lambda mm, qq: knn_grouped(mm, qq, grid, k=5, g_max=g_max))
        nb1, sq1, v1 = pallas_jit(m, queries)
        jax.block_until_ready(sq1)
        lat = []
        for _ in range(30):
            t0 = time.perf_counter()
            out = pallas_jit(m, queries)
            jax.block_until_ready(out[1])
            lat.append(time.perf_counter() - t0)
        pallas_ms = float(np.percentile(lat, 50)) * 1e3
        # agreement on the valid overlap
        both = np.asarray(v0) & np.asarray(v1)
        agree = float(np.mean(np.isclose(np.asarray(sq0)[both],
                                         np.asarray(sq1)[both], atol=1e-5)))
    except Exception as e:
        print(f"pallas path failed: {type(e).__name__}: {e}")
        pallas_ms, agree = float("nan"), 0.0

    print(f"XLA knn (rings=1):    p50 = {xla_ms:.3f} ms")
    print(f"Pallas knn_grouped:   p50 = {pallas_ms:.3f} ms   "
          f"(d2 agreement on overlap: {agree*100:.2f}%)")
    print(f"verdict: {'PALLAS WINS' if pallas_ms < xla_ms else 'XLA WINS'} "
          f"({xla_ms/pallas_ms:.2f}x)" if pallas_ms == pallas_ms else "verdict: kernel broken")

    # ------------------------------------------------------------------
    # PRODUCTION envelope (VERDICT r3 #6): voxel-downsampled window,
    # derived rings=3 + max_buckets=32 tier — the racing/KITTI setting.
    # Timing before any readback (this process is already poisoned by the
    # agreement checks above, so absolute numbers here are only comparable
    # to each other via amortized unblocked dispatch).
    # ------------------------------------------------------------------
    from limovelo_tpu.ops.voxel import voxel_downsample

    ds = voxel_downsample(jnp.asarray(q), jnp.arange(N) < take, jnp.float32(0.5))
    ds_pts = np.asarray(ds.pts)
    ds_msk = np.asarray(ds.mask)
    nq = 2048
    qd = np.zeros((nq, 3), np.float32)
    sel = np.nonzero(ds_msk)[0][:nq]
    qd[: len(sel)] = ds_pts[sel]
    queries_d = jnp.asarray(qd)
    voxd = np.unique(np.floor(qd[: len(sel)] / grid.coarse_size).astype(np.int64), axis=0)
    print(f"\nproduction regime: {len(sel)} ds-queries over {len(voxd)} "
          f"coarse voxels -> {len(sel)/max(len(voxd),1):.1f} queries/voxel, "
          f"rings=3 max_buckets=32")

    def amortized(fn, *args, reps=50):
        out = fn(*args)
        jax.block_until_ready(out[1])
        t0 = time.perf_counter()
        outs = [fn(*args) for _ in range(reps)]
        jax.block_until_ready(outs[-1][1])
        return (time.perf_counter() - t0) / reps * 1e3, outs[-1]

    knn3_jit = jax.jit(lambda mm, qq: knn(mm, qq, grid, k=5, rings=3,
                                          max_buckets=32))
    xla3_ms, o0 = amortized(knn3_jit, m, queries_d)
    try:
        pal3_jit = jax.jit(lambda mm, qq: knn_grouped(
            mm, qq, grid, k=5, g_max=1400, rings=3, max_buckets=32))
        pal3_ms, o1 = amortized(pal3_jit, m, queries_d)
        both = np.asarray(o0[2]) & np.asarray(o1[2])
        agree3 = float(np.mean(np.isclose(np.asarray(o0[1])[both],
                                          np.asarray(o1[1])[both], atol=1e-4)))
    except Exception as e:
        print(f"pallas tiered path failed: {type(e).__name__}: {e}")
        pal3_ms, agree3 = float("nan"), 0.0
    print(f"XLA knn (rings=3, mb=32):    amortized = {xla3_ms:.3f} ms")
    print(f"Pallas tiered knn_grouped:   amortized = {pal3_ms:.3f} ms   "
          f"(d2 agreement on overlap: {agree3*100:.2f}%)")
    if pal3_ms == pal3_ms:
        print(f"production verdict: "
              f"{'PALLAS WINS' if pal3_ms < xla3_ms else 'XLA WINS'} "
              f"({xla3_ms/pal3_ms:.2f}x)")


if __name__ == "__main__":
    main()
