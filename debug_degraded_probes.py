"""r5 probe battery behind BENCH.md's degraded-mode model (run on the TPU).

Three probes, each a fresh-process measurement (run them SEPARATELY — any
d2h read poisons the whole process):

  h2d      enqueue vs completion cost of host->device transfers and
           dispatches, clean vs after one readback (probe of r5: enqueue
           survives sub-ms; completion flips to ~26 ms per BLOCKING call,
           but a non-blocking stream still moves at ~2 ms/step)
  donate   donated-buffer streams and the copy_to_host_async stream stall
           (~300 ms per async copy in degraded mode - the r4 telemetry
           design's hidden cost)
  realstep the production lio_step streamed read-free: ~0.18 ms/step clean
           vs ~28 ms/step after one readback - the degraded mode slows
           program EXECUTION, and small probes do not predict it

Usage: python debug_degraded_probes.py {h2d|donate|realstep}
"""
import sys
import time
from functools import partial

import numpy as np


def probe_h2d():
    import jax, jax.numpy as jnp

    @jax.jit
    def f(x, y):
        return x * 1.0001 + y.sum()

    x = jnp.ones((256, 256))
    buf = np.ones(12000, np.float32)
    y = jnp.asarray(buf)
    jax.block_until_ready(f(x, y))

    def t_h2d():
        t0 = time.perf_counter()
        z = jnp.asarray(buf)
        t1 = time.perf_counter()
        jax.block_until_ready(z)
        return (t1 - t0) * 1e3, (time.perf_counter() - t0) * 1e3

    def t_disp():
        nonlocal x
        t0 = time.perf_counter()
        out = f(x, y)
        t1 = time.perf_counter()
        jax.block_until_ready(out)
        x = out
        return (t1 - t0) * 1e3, (time.perf_counter() - t0) * 1e3

    def report(tag, fn):
        r = [fn() for _ in range(20)]
        print(f"{tag}: enqueue p50={np.median([a for a,_ in r]):.3f} ms, "
              f"complete p50={np.median([b for _,b in r]):.3f} ms", flush=True)

    report("h2d-clean ", t_h2d); report("disp-clean", t_disp)
    _ = np.asarray(x)          # poison
    report("h2d-poison", t_h2d); report("disp-poison", t_disp)
    t0 = time.perf_counter()
    for _ in range(50):
        z = jnp.asarray(buf)
        x = f(x, z)
    jax.block_until_ready(x)
    print(f"streamed h2d+dispatch x50 (poisoned): "
          f"{(time.perf_counter()-t0)/50*1e3:.3f} ms/step")


def probe_donate():
    import jax, jax.numpy as jnp

    @partial(jax.jit, donate_argnums=(0,))
    def f_don(m, y):
        return m.at[0, 0].add(y.sum() * 1e-9)

    m = jnp.ones((1 << 14, 64, 3))
    buf = np.ones(12000, np.float32)
    y = jnp.asarray(buf)
    m = f_don(m, y); jax.block_until_ready(m)
    tel = jnp.ones(43)

    def stream(tag, with_copy):
        nonlocal m
        t0 = time.perf_counter()
        for i in range(30):
            z = jnp.asarray(buf)
            m = f_don(m, z)
            if with_copy and i % 8 == 7:
                s = jnp.stack([tel] * 8)
                s.copy_to_host_async()
        jax.block_until_ready(m)
        print(f"{tag}: {(time.perf_counter()-t0)/30*1e3:.3f} ms/step", flush=True)

    stream("donated-clean          ", False)
    _ = np.asarray(y)          # poison
    stream("donated-poison         ", False)
    stream("donated-poison+copyasync", True)


def probe_realstep():
    sys.path.insert(0, ".")
    from __graft_entry__ import _enable_compile_cache
    _enable_compile_cache()
    import jax
    import bench as B
    from limovelo_tpu import Config
    from limovelo_tpu.step import lio_step

    cfg = Config(**B._base_cfg_kwargs())
    ctx = B._make_step(cfg)
    inp, m = ctx["inp"], ctx["m"]

    def stream(tag, n=30):
        nonlocal m
        t0 = time.perf_counter()
        out = None
        for _ in range(n):
            out = lio_step(inp, m, ctx["static"], ctx["grid"])
            m = out.map
        jax.block_until_ready(out.x)
        print(f"{tag}: {(time.perf_counter()-t0)/n*1e3:.3f} ms/step", flush=True)
        return out

    out = stream("real-step clean ")
    _ = np.asarray(out.telemetry)   # poison
    stream("real-step poison")


if __name__ == "__main__":
    {"h2d": probe_h2d, "donate": probe_donate,
     "realstep": probe_realstep}[sys.argv[1]]()
