"""Dedupe-proof step-timing probe: the bench harness with override knobs.

The axon relay can (a) inflate chained-dispatch timing loops by up to ~90x
(dispatches return before execution; a trailing block_until_ready is not
enough) and (b) dedupe bit-identical executions — see ROADMAP
"MEASUREMENT CAUTION".  bench.py's defenses (ITERS steps inside one jitted
lax.scan, every step's loss materialized inside the timed region, distinct-
finite-loss assertions, min-of-REPEATS walls, profiler device time
alongside) live in ``bench.bench_3d_train``; this probe reuses that exact
harness with experiment knobs, so A/B numbers are produced by the same
trustworthy machinery as the headline:

    NDT_PROBE_BINDINGS='CoordinateContext.window_blocks = 6'  # extra gin
    python scratch/bench_probe.py

Prints the same JSON schema as bench.py (headline + step_ms +
device_step_ms) without the 2D/eval/input-pipeline extras.
"""

from __future__ import annotations

import json
import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)


def main():
    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    import bench

    enable_compilation_cache(os.path.join(_REPO_ROOT, ".jax_cache"))
    extra = os.environ.get("NDT_PROBE_BINDINGS", "").replace(";", "\n")
    if extra:
        bench.BLOCK_BINDINGS = bench.BLOCK_BINDINGS + extra + "\n"
    vps, step_dt, device_ms = bench.bench_3d_train()
    print(
        json.dumps(
            {
                "metric": "probe_train_voxels_per_sec_per_chip",
                "value": round(vps, 1),
                "unit": "voxels/s",
                "extra_bindings": extra,
                "step_ms": round(step_dt * 1e3, 1),
                "device_step_ms": device_ms,
            }
        )
    )


if __name__ == "__main__":
    main()
