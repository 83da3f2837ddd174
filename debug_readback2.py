"""Second-stage readback-pathology probes (see debug_readback.py).

Modes:
  throughput       poison, then enqueue 30 dispatches WITHOUT per-step
                   blocking, block once at end -> is it latency or throughput
                   that degrades?
  throughput_clean same, no poison (control for queue depth)
  tinyread         poison via np.asarray of a fresh jnp.zeros(3) (non-jit
                   output) -> does ANY transfer poison, or only executable
                   outputs?
  putonly          jax.device_put of a numpy array before loop (host->device
                   only) -> does upload poison?
  callback         jax.debug.callback inside the jit (host transfer via
                   runtime) -> poisons?
  newclient        poison, then tear down the backend client
                   (jax.extend.backend.clear_backends) and re-jit -> recovers?
"""

import sys
import time

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


def timed_loop(fj, y, idx, n=30, block_each=True):
    import jax
    lat = []
    t00 = time.perf_counter()
    for _ in range(n):
        t0 = time.perf_counter()
        y, tel = fj(y, idx)
        if block_each:
            jax.block_until_ready(y)
        lat.append(time.perf_counter() - t0)
    jax.block_until_ready(y)
    total = time.perf_counter() - t00
    return y, tel, float(np.percentile(lat, 50)) * 1e3, total / n * 1e3


def run(mode):
    import jax
    import jax.numpy as jnp

    if mode == "callback":
        # build a variant with a debug callback inside
        def cb(v):
            pass

        def f(x, idx):
            y = x
            for _ in range(4):
                y = jnp.tanh(y @ y.T @ y * 1e-3)
            tel = jnp.stack([y.sum(), y.max()])
            jax.debug.callback(cb, tel)
            return y, tel

        fj = jax.jit(f, donate_argnums=(0,))
        x = jnp.asarray(np.zeros((512, 512), np.float32))
        idx = jnp.asarray(np.arange(0, 512, 7, dtype=np.int32))
        y, tel = fj(x, idx)
        jax.block_until_ready(y)
        y, tel, p50, per = timed_loop(fj, y, idx)
        print(f"[{mode}] p50 = {p50:.3f} ms (per-step {per:.3f} ms)")
        return

    fj, y, tel, idx = build()

    if mode == "throughput":
        _ = np.asarray(tel)
        y, tel, p50, per = timed_loop(fj, y, idx, block_each=False)
        print(f"[{mode}] poisoned, unblocked: dispatch p50 = {p50:.3f} ms, "
              f"per-step amortized = {per:.3f} ms")
    elif mode == "throughput_clean":
        y, tel, p50, per = timed_loop(fj, y, idx, block_each=False)
        print(f"[{mode}] clean, unblocked: dispatch p50 = {p50:.3f} ms, "
              f"per-step amortized = {per:.3f} ms")
    elif mode == "tinyread":
        z = jnp.zeros(3)
        jax.block_until_ready(z)
        _ = np.asarray(z)
        y, tel, p50, per = timed_loop(fj, y, idx)
        print(f"[{mode}] after reading a fresh jnp.zeros(3): p50 = {p50:.3f} ms")
    elif mode == "putonly":
        _ = jax.device_put(np.ones(16, np.float32))
        y, tel, p50, per = timed_loop(fj, y, idx)
        print(f"[{mode}] after device_put only: p50 = {p50:.3f} ms")
    elif mode == "newclient":
        _ = np.asarray(tel)
        y, tel, p50, per = timed_loop(fj, y, idx)
        print(f"[{mode}] poisoned p50 = {p50:.3f} ms")
        try:
            import jax.extend.backend as jexb
            jexb.clear_backends()
        except Exception as e:  # noqa: BLE001
            print(f"[{mode}] clear_backends failed: {e!r}")
            return
        fj2, y2, tel2, idx2 = build()
        y2, tel2, p50b, per = timed_loop(fj2, y2, idx2)
        print(f"[{mode}] after clear_backends+rebuild p50 = {p50b:.3f} ms")
    else:
        raise SystemExit(f"unknown mode {mode}")


if __name__ == "__main__":
    run(sys.argv[1])
