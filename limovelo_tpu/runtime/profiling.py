"""Tracing / profiling surface (SURVEY.md §5 tracing row).

The reference's only tracing is a never-instantiated `MicroTimer`
(`/root/reference/include/Headers/Utils.hpp:62-88`) and a discarded
`solve_H_time` out-param.  Here profiling is first-class:

- `trace(logdir)`: context manager around `jax.profiler` — captures an
  xprof/perfetto trace of everything inside (device kernels, transfers,
  host dispatch).  View with `tensorboard --logdir` or ui.perfetto.dev.
- `annotate(name)`: a `jax.profiler.TraceAnnotation` wrapper so pipeline
  stages (deskew/update/insert) show up as named spans inside the trace.
- `StageTimers`: lightweight per-stage wall timers with p50/p95 summaries —
  the always-on counterpart (the JSONL metrics stream carries per-step
  `wall_ms`; this aggregates per *stage* across a run).

CLI: `python -m limovelo_tpu sim --profile /tmp/trace ...` wraps the whole
replay in `trace()`.
"""

from __future__ import annotations

import time
from collections import defaultdict
from contextlib import contextmanager
from typing import Dict, List


@contextmanager
def trace(logdir: str):
    """Capture a jax.profiler trace of the enclosed block into `logdir`."""
    import jax

    jax.profiler.start_trace(logdir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


def annotate(name: str):
    """Named span inside a `trace()` capture (TraceAnnotation context)."""
    import jax

    return jax.profiler.TraceAnnotation(name)


class StageTimers:
    """Always-on per-stage wall timers.

    >>> timers = StageTimers()
    >>> with timers("deskew"):
    ...     run_deskew()
    >>> timers.summary()   # {"deskew": {"n": 1, "p50_ms": ..., "p95_ms": ...}}
    """

    def __init__(self):
        self._samples: Dict[str, List[float]] = defaultdict(list)

    @contextmanager
    def __call__(self, stage: str):
        t0 = time.perf_counter()
        try:
            yield
        finally:
            self._samples[stage].append(time.perf_counter() - t0)

    def summary(self) -> Dict[str, Dict[str, float]]:
        import numpy as np

        out = {}
        for stage, xs in self._samples.items():
            a = np.asarray(xs) * 1e3
            out[stage] = {
                "n": len(xs),
                "p50_ms": float(np.percentile(a, 50)),
                "p95_ms": float(np.percentile(a, 95)),
                "total_ms": float(a.sum()),
            }
        return out

    def report(self) -> str:
        rows = [f"{'stage':16s} {'n':>6s} {'p50 ms':>9s} {'p95 ms':>9s} {'total ms':>10s}"]
        for stage, s in sorted(self.summary().items()):
            rows.append(
                f"{stage:16s} {s['n']:6d} {s['p50_ms']:9.3f} "
                f"{s['p95_ms']:9.3f} {s['total_ms']:10.1f}"
            )
        return "\n".join(rows)
