"""Characterize the readback-poisoning pathology on the tunneled TPU runtime.

VERDICT r03 established: ONE device->host readback (np.asarray / device_get) of
ANY output of the donated production step permanently degrades every subsequent
dispatch in the process to ~50 ms.  This probe measures, in ISOLATED
subprocesses (one mode per process), which readback protocols poison and which
un-poison levers work.

Usage:  python debug_readback.py            # run all modes as subprocesses
        python debug_readback.py MODE       # run one mode in-process

Modes:
  control          no readback at all; timed loop only
  asarray          np.asarray(out) before the timed loop (expected poison)
  device_get       jax.device_get before loop
  async_copy       out.copy_to_host_async() before loop, np.asarray AFTER loop
  async_read       copy_to_host_async + np.asarray immediately (sync on async)
  nondonated       read output of a separate small NON-donated jit that copies
                   the telemetry, before the loop
  dlpack           read via dlpack -> torch/np before the loop
  after_only       readback only AFTER the timed loop (bench-safe protocol?)
  poison_recover   poison with asarray, then try jax.clear_caches() +
                   re-dispatch; report whether latency recovers
  poison_newexec   poison, then re-jit (fresh executable) and measure
  item             float(out_scalar) before loop (scalar .item() path)
"""

import subprocess
import sys
import time

import numpy as np

MODES = [
    "control", "asarray", "device_get", "async_copy", "async_read",
    "nondonated", "dlpack", "after_only", "poison_recover", "poison_newexec",
    "item",
]


def build():
    import jax
    import jax.numpy as jnp

    # Representative program: a few matmuls + a dynamic gather + scatter-add,
    # with donation like the production step.
    def f(x, idx):
        y = x
        for _ in range(4):
            y = jnp.tanh(y @ y.T @ y * 1e-3)
        g = y[idx]                       # dynamic gather
        y = y.at[idx].add(g * 0.01)      # dynamic scatter
        tel = jnp.stack([y.sum(), y.max(), jnp.float32(idx.shape[0])])
        return y, tel

    fj = jax.jit(f, donate_argnums=(0,))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(512, 512)).astype(np.float32))
    idx = jnp.asarray(np.arange(0, 512, 7, dtype=np.int32))
    y, tel = fj(x, idx)
    jax.block_until_ready(y)
    return fj, y, tel, idx


def timed_loop(fj, y, idx, n=30):
    import jax
    lat = []
    for _ in range(n):
        t0 = time.perf_counter()
        y, tel = fj(y, idx)
        jax.block_until_ready(y)
        lat.append(time.perf_counter() - t0)
    return y, tel, float(np.percentile(lat, 50)) * 1e3


def run(mode):
    import jax
    import jax.numpy as jnp

    fj, y, tel, idx = build()

    if mode == "control":
        pass
    elif mode == "asarray":
        _ = np.asarray(tel)
    elif mode == "device_get":
        _ = jax.device_get(tel)
    elif mode == "async_copy":
        tel.copy_to_host_async()
    elif mode == "async_read":
        tel.copy_to_host_async()
        _ = np.asarray(tel)
    elif mode == "nondonated":
        copier = jax.jit(lambda t: t + 0.0)
        tel2 = copier(tel)
        _ = np.asarray(tel2)
    elif mode == "dlpack":
        try:
            cap = jax.dlpack.to_dlpack(tel)
            _ = cap
        except Exception as e:  # noqa: BLE001
            print(f"  dlpack export failed: {e!r}")
    elif mode == "item":
        _ = float(tel[0])
    elif mode in ("after_only", "poison_recover", "poison_newexec"):
        pass
    else:
        raise SystemExit(f"unknown mode {mode}")

    y, tel, p50 = timed_loop(fj, y, idx)
    print(f"[{mode}] phase1 p50 = {p50:.3f} ms")

    if mode == "after_only":
        _ = np.asarray(tel)
        y, tel, p50b = timed_loop(fj, y, idx)
        print(f"[{mode}] phase2 (after one post-loop readback) p50 = {p50b:.3f} ms")
    elif mode == "poison_recover":
        _ = np.asarray(tel)
        y, tel, p50b = timed_loop(fj, y, idx)
        print(f"[{mode}] poisoned p50 = {p50b:.3f} ms")
        jax.clear_caches()
        fj2, y2, tel2, idx2 = build()
        y2, tel2, p50c = timed_loop(fj2, y2, idx2)
        print(f"[{mode}] after clear_caches+rebuild p50 = {p50c:.3f} ms")
    elif mode == "poison_newexec":
        _ = np.asarray(tel)
        y, tel, p50b = timed_loop(fj, y, idx)
        print(f"[{mode}] poisoned p50 = {p50b:.3f} ms")
        fj2, y2, tel2, idx2 = build()   # fresh executable, same client
        y2, tel2, p50c = timed_loop(fj2, y2, idx2)
        print(f"[{mode}] fresh executable p50 = {p50c:.3f} ms")


def main():
    if len(sys.argv) > 1:
        run(sys.argv[1])
        return
    for mode in MODES:
        r = subprocess.run(
            [sys.executable, __file__, mode],
            capture_output=True, text=True, timeout=600,
        )
        out = [ln for ln in r.stdout.splitlines() if ln.startswith("[") or "failed" in ln]
        for ln in out:
            print(ln)
        if r.returncode != 0:
            print(f"[{mode}] FAILED rc={r.returncode}: {r.stderr.strip().splitlines()[-1] if r.stderr.strip() else ''}")


if __name__ == "__main__":
    main()
