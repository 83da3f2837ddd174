"""Third-stage probes: readback COST structure once poisoned (see
debug_readback.py for the poison/no-poison matrix).

Modes:
  lagread      poisoned; dispatch 8 steps, async-copy each telemetry, keep
               dispatching 20 more steps (~30+ ms of work), then read all 8
               -> does a landed async copy make the read free?
  seqread      poisoned; 8 ready buffers, np.asarray each immediately ->
               is the ~26 ms round trip paid per read (serialized)?
  stackread    poisoned; 8 telemetry buffers stacked on device by a tiny jit,
               ONE read -> batched-readback cost
  threadread   poisoned; 8 ready buffers read concurrently from 8 threads ->
               do round trips overlap?
"""

import sys
import time
from concurrent.futures import ThreadPoolExecutor

import numpy as np


def build():
    import jax
    import jax.numpy as jnp

    def f(x, idx):
        y = x
        for _ in range(4):
            y = jnp.tanh(y @ y.T @ y * 1e-3)
        g = y[idx]
        y = y.at[idx].add(g * 0.01)
        tel = jnp.stack([y.sum(), y.max(), jnp.float32(idx.shape[0])])
        return y, tel

    fj = jax.jit(f, donate_argnums=(0,))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)).astype(np.float32))
    idx = jnp.asarray(np.arange(0, 512, 7, dtype=np.int32))
    y, tel = fj(x, idx)
    jax.block_until_ready(y)
    return fj, y, tel, idx


def run(mode):
    import jax
    import jax.numpy as jnp

    fj, y, tel, idx = build()
    _ = np.asarray(tel)  # poison
    # confirm poisoned blocking latency
    t0 = time.perf_counter()
    y, tel = fj(y, idx)
    jax.block_until_ready(y)
    print(f"[{mode}] poisoned blocking step = {(time.perf_counter()-t0)*1e3:.2f} ms")

    tels = []
    for _ in range(8):
        y, tel = fj(y, idx)
        tels.append(tel)

    if mode == "lagread":
        for t in tels:
            t.copy_to_host_async()
        for _ in range(20):   # keep the queue busy while copies land
            y, tel2 = fj(y, idx)
        jax.block_until_ready(y)
        time.sleep(0.05)
        lat = []
        for t in tels:
            t0 = time.perf_counter()
            _ = np.asarray(t)
            lat.append((time.perf_counter() - t0) * 1e3)
        print(f"[{mode}] per-read after lag: {['%.2f' % v for v in lat]} ms")
    elif mode == "seqread":
        jax.block_until_ready(tels[-1])
        lat = []
        for t in tels:
            t0 = time.perf_counter()
            _ = np.asarray(t)
            lat.append((time.perf_counter() - t0) * 1e3)
        print(f"[{mode}] per-read (ready buffers, no lag): {['%.2f' % v for v in lat]} ms")
    elif mode == "stackread":
        stk = jax.jit(lambda ts: jnp.stack(ts))
        s = stk(tels)
        jax.block_until_ready(s)
        t0 = time.perf_counter()
        _ = np.asarray(s)
        print(f"[{mode}] one stacked read of 8 telemetries: {(time.perf_counter()-t0)*1e3:.2f} ms")
    elif mode == "threadread":
        jax.block_until_ready(tels[-1])
        t0 = time.perf_counter()
        with ThreadPoolExecutor(8) as ex:
            list(ex.map(lambda t: np.asarray(t), tels))
        print(f"[{mode}] 8 concurrent reads total: {(time.perf_counter()-t0)*1e3:.2f} ms")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    run(sys.argv[1])
