"""Device op-time attribution for the 2D train steps (VERDICT r4 #9).

Same methodology as trace_attr.py (profiler device plane, XLA Ops line),
pointed at bench.bench_2d's exact programs. Prints the per-op table plus
a convolution-vs-elementwise rollup and the roofline context for the top
ops: for each conv, FLOPs / peak-MXU-time and bytes / peak-HBM-time —
which bound binds is what decides whether an optimization attempt can
pay (ROADMAP round-5 2D section).

Run (needs the TPU):
    python scratch/trace_2d.py [--arch resnet18|vit_small_patch16_224]
        [--batch 128] [--top 30]
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


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--arch", type=str, default="resnet18")
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    from nerf_downstream_tpu.utils.compile_cache import (
        enable_compilation_cache,
    )

    enable_compilation_cache(os.path.join(_REPO_ROOT, ".jax_cache"))

    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu import config as cfg
    from nerf_downstream_tpu.train.modules2d import LitModel

    s = 224
    rng = np.random.default_rng(0)
    data = {
        "images": jnp.asarray(
            rng.normal(size=(args.batch, s, s, 3)).astype(np.float32)
        ),
        "labels": jnp.asarray(rng.integers(0, 51, args.batch)),
    }
    cfg.clear_config()
    cfg.bind("ResNetBased", "dtype", jnp.bfloat16)
    cfg.bind("ViTBased", "dtype", jnp.bfloat16)
    lit = LitModel(model_name=args.arch, num_training_steps=1000)
    cfg.clear_config()
    state = lit.create_state(jax.random.PRNGKey(0), data)
    step = lit.make_train_step()

    iters = 20
    import functools

    @functools.partial(jax.jit, donate_argnums=(0,))
    def multi(st):
        def body(carry, _):
            carry, mets = step(carry, data)
            return carry, mets["loss"]

        return jax.lax.scan(body, st, None, length=iters)

    state, losses = multi(state)
    np.asarray(losses)

    logdir = tempfile.mkdtemp(prefix="ndt_trace2d")
    try:
        with jax.profiler.trace(logdir):
            state, losses = multi(state)
            np.asarray(losses)
            jax.block_until_ready(state.params)
        assert np.isfinite(np.asarray(losses)).all()
        paths = glob.glob(f"{logdir}/**/*.xplane.pb", recursive=True)
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
                        ops[ev.name] += ev.duration_ns / 1e6
        print(
            f"{args.arch} B={args.batch}: module {module_ms / iters:.2f} "
            f"ms/step ({args.batch * iters / module_ms * 1e3:,.0f} img/s "
            "device-clocked)"
        )
        cats = defaultdict(float)
        for name, ms in ops.items():
            if name.startswith("%while") or name.startswith("while"):
                continue
            head = name.split(" = ")[0]
            if "convolution" in name or "conv" in head:
                key = "convolution"
            elif "dot" in head or "dot-general" in name:
                key = "matmul"
            elif "fusion" in head:
                key = "fusion (elementwise/BN/reduce)"
            elif "copy" in head:
                key = "copy"
            else:
                key = "other"
            cats[key] += ms
        print("-- rollup (ms/step) --")
        for k, ms in sorted(cats.items(), key=lambda x: -x[1]):
            print(f"{k:<34} {ms / iters:>8.2f}")
        print("-- top ops --")
        for name, ms in sorted(ops.items(), key=lambda x: -x[1])[
            1:args.top + 1
        ]:
            print(f"{ms / iters:8.3f}  {name[:160]}")
    finally:
        shutil.rmtree(logdir, ignore_errors=True)


if __name__ == "__main__":
    main()
