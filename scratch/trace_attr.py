"""Device op-time attribution for the flagship train step.

THE optimization loop of rounds 2-3 (ROADMAP: "trace-attribute first"):
wall-clock on the shared TPU pool carries ±2x queue noise, so every
optimization decision is made on profiler DEVICE op time, which is stable
±3% run to run.  This script builds the exact bench train program
(bench.py bindings), traces one ITERS-step scanned execution with
``jax.profiler.trace``, and attributes the device plane two ways:

- ``XLA Modules`` line: total module time / ITERS — the per-step ground
  truth (the number BASELINE.md calls "device-clocked");
- ``XLA Ops`` line: per-op durations aggregated by sanitized op name
  (fusion.N -> fusion, Mosaic custom-calls keep their kernel name), the
  table that localizes the next target (e.g. stems conv0a/b ~16 ms,
  ROADMAP round-3 log).

Run (needs the TPU):
    python scratch/trace_attr.py [--top 30] [tile=256] [window=128]
        [blocks=4] [esc_cap=(8192,2048,512,512,0)] [esc_tiles=(64,...)]
Positional ``key=value`` args override the matching CoordinateContext
window knob; arbitrary extra gin comes via
``NDT_PROBE_BINDINGS='CoordinateContext.level_caps = (...)'``.
"""

from __future__ import annotations

import argparse
import glob
import os
import re
import shutil
import sys
import tempfile
from collections import defaultdict

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def build_multi_step():
    import functools

    import jax
    import jax.numpy as jnp

    import bench
    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.train.loop import array_batch

    cfg.clear_config()
    bindings = bench.BLOCK_BINDINGS + os.environ.get(
        "NDT_PROBE_BINDINGS", ""
    ).replace(";", "\n")
    cfg.parse_config(bindings)
    batch = array_batch(bench.make_batch(np.random.default_rng(0)))
    task = bench._make_task(jnp)
    state = task.create_state(jax.random.PRNGKey(0), batch)
    step = task.make_train_step(donate=True)

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi_step(s):
        def body(carry, _):
            carry, mets = step(carry, batch)
            return carry, mets["loss"]

        return jax.lax.scan(body, s, None, length=bench.ITERS)

    return multi_step, state, int(np.asarray(batch["mask"]).sum())


def sanitize(name: str) -> str:
    """fusion.123 -> fusion; custom calls (the Mosaic kernels) keep their
    RESULT SHAPE so convs of different (level, Cin, Cout) attribute
    separately — kernel names are all 'tpu_custom_call' post-refactor,
    but the output shape identifies the conv uniquely."""
    m = re.search(r"(window_[a-z_]+|tpu_custom_call[\w-]*)", name)
    if m:
        shape = re.search(r"= (\(?[a-z0-9\[\],\s]+)", name)
        return (
            f"{m.group(1)} {shape.group(1).strip()}" if shape else m.group(1)
        )
    return re.sub(r"\.\d+$", "", name)


KNOBS = {
    "tile": "window_tile",
    "window": "window_size",
    "blocks": "window_blocks",
    "expand": "window_expand_factor",
    "esc_cap": "window_escape_cap",
    "esc_tiles": "window_escape_tiles",
}


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--top", type=int, default=30)
    ap.add_argument("--raw", type=int, default=0)
    ap.add_argument("knobs", nargs="*", metavar="key=value")
    args = ap.parse_args()
    extra = [os.environ.get("NDT_PROBE_BINDINGS", "")]
    for kv in args.knobs:
        k, v = kv.split("=", 1)
        extra.append(f"CoordinateContext.{KNOBS[k]} = {v}")
    os.environ["NDT_PROBE_BINDINGS"] = "\n".join(extra)

    import jax

    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    import bench

    enable_compilation_cache(os.path.join(_REPO_ROOT, ".jax_cache"))
    multi_step, state, n_valid = build_multi_step()
    state, losses = multi_step(state)  # compile + warm
    np.asarray(losses)

    logdir = tempfile.mkdtemp(prefix="ndt_trace_attr")
    try:
        with jax.profiler.trace(logdir):
            state, losses = multi_step(state)
            np.asarray(losses)
            jax.block_until_ready(state.params)
        assert np.isfinite(np.asarray(losses)).all(), "poisoned run"
        paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
        assert paths, "no xplane captured (CPU-only run?)"
        pd = jax.profiler.ProfileData.from_file(paths[0])
        module_ms = 0.0
        ops = defaultdict(float)
        for plane in pd.planes:
            if "TPU" not in plane.name and "Device" not in plane.name:
                continue
            for line in plane.lines:
                if line.name == "XLA Modules":
                    for ev in line.events:
                        module_ms += ev.duration_ns / 1e6
                elif line.name == "XLA Ops":
                    for ev in line.events:
                        ops[sanitize(ev.name)] += ev.duration_ns / 1e6
        print(
            f"module {module_ms:.1f} ms total -> "
            f"{module_ms / bench.ITERS:.2f} ms/step "
            f"({n_valid * bench.ITERS / module_ms * 1e3:,.0f} voxels/s "
            "device-clocked)"
        )
        total_ops = sum(ops.values())
        print(f"{'op (sanitized)':<48} {'ms/step':>8} {'share':>6}")
        for name, ms in sorted(ops.items(), key=lambda x: -x[1])[: args.top]:
            print(
                f"{name[:48]:<48} {ms / bench.ITERS:>8.2f} "
                f"{ms / total_ops:>6.1%}"
            )
        # category rollup (the while wrapper double-counts its body; skip)
        cats = defaultdict(float)
        for name, ms in ops.items():
            if name.startswith("%while") or name.startswith("while"):
                continue
            if "tpu_custom_call" in name or "window_" in name:
                key = "custom_call (Mosaic kernels)"
            elif name.startswith("%fusion") or name.startswith("fusion"):
                mshape = re.search(r"= ([a-z0-9]+)\[([0-9,]*)\]", name)
                key = (
                    f"fusion {mshape.group(1)}[{mshape.group(2)}]"
                    if mshape else "fusion other"
                )
                # bucket by rank only: 1-D vs 2-D large vs small
                if mshape:
                    dims = [int(d) for d in mshape.group(2).split(",") if d]
                    n_el = int(np.prod(dims)) if dims else 0
                    key = (
                        f"fusion {len(dims)}D "
                        f"{'big' if n_el >= 1 << 20 else 'small'} "
                        f"{mshape.group(1)}"
                    )
            elif ".copy" in name or "copy" in name.split(" = ")[0]:
                key = "copy"
            elif "sort" in name:
                key = "sort"
            elif "dynamic-update-slice" in name or "dynamic-slice" in name:
                key = "dynamic-slice/update"
            else:
                key = "other " + name.split(" = ")[0].split(".")[0]
            cats[key] += ms
        print("\n-- category rollup (ms/step) --")
        for k, ms in sorted(cats.items(), key=lambda x: -x[1])[:20]:
            print(f"{k:<44} {ms / bench.ITERS:>8.2f}")
        if args.raw:
            print("\n-- raw top ops --")
            for name, ms in sorted(
                ops.items(), key=lambda x: -x[1]
            )[: args.raw]:
                print(f"{ms / bench.ITERS:8.2f}  {name[:200]}")
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
