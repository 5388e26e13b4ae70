"""Micro-benchmark helper (reference co3d_3d/src/utils/benchmark.py:6-22).

``measure_time`` runs a callable under sample/time limits and reports
mean/min wall time; jax outputs are blocked on for honest device timing.
"""

from __future__ import annotations

import time
from typing import Callable


def _block(out):
    try:
        import jax

        jax.block_until_ready(out)
    except Exception:
        pass
    return out


def measure_time(
    fn: Callable,
    *args,
    max_samples: int = 100,
    max_seconds: float = 10.0,
    warmup: int = 1,
    **kwargs,
) -> dict:
    for _ in range(warmup):
        _block(fn(*args, **kwargs))
    times = []
    t_start = time.perf_counter()
    for _ in range(max_samples):
        t0 = time.perf_counter()
        _block(fn(*args, **kwargs))
        times.append(time.perf_counter() - t0)
        if time.perf_counter() - t_start > max_seconds:
            break
    return {
        "mean": sum(times) / len(times),
        "min": min(times),
        "max": max(times),
        "samples": len(times),
    }
