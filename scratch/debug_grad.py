"""TPU-side parity probe: Pallas vs XLA-fallback for plan building,
forward, and gradients — pinpoints which kernel diverges ON HARDWARE
(the interpret-mode CPU tier passes; the 2026-08-21 convergence gate
failed, so something differs only under real Mosaic lowering).
"""

from __future__ import annotations

import os
import sys

_REPO_ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, _REPO_ROOT)

import numpy as np


def main():
    import jax
    import jax.numpy as jnp

    from nerf_downstream_tpu.ops import window_conv as W
    from nerf_downstream_tpu.sparse.kernels import kernel_offsets

    rng = np.random.default_rng(0)
    n, c, cout = 4096, 32, 32
    pts = np.unique(rng.integers(0, 40, (6000, 3)), axis=0)
    rng.shuffle(pts)
    pts = pts[: n - 200]
    coords = np.zeros((n, 4), np.int32)
    coords[: len(pts), 1:] = np.asarray(
        sorted(map(tuple, pts))
    )  # will re-sort by packed key below anyway
    mask = np.arange(n) < len(pts)

    # sort by packed key exactly like the runtime
    from nerf_downstream_tpu.sparse import packing

    cj = jnp.asarray(coords)
    mj = jnp.asarray(mask)
    hi, lo = packing.pack(cj, mj)
    _, _, order = packing.sort_with_payload(
        hi, lo, jnp.arange(n, dtype=jnp.int32)
    )
    cj = cj[order]
    mj = mj[order]

    offs = kernel_offsets(3, 1)
    kw = dict(tile=256, window=128, blocks=4)
    feats = jnp.asarray(
        rng.normal(size=(n, c)).astype(np.float32)
    ).astype(jnp.bfloat16)
    w = jnp.asarray(
        (rng.normal(size=(27, c, cout)) * 0.1).astype(np.float32)
    )
    g_out = jnp.asarray(
        rng.normal(size=(n, cout)).astype(np.float32)
    )

    def build(esc):
        cap = dict(escape_cap=4096, escape_tiles=16) if esc else {}
        plan = W.build_plan_direct(cj, mj, offs, **kw, **cap)
        inv = W.transpose_plan(plan, offs)
        return plan, inv

    results = {}
    for mode in ("1", "0"):
        os.environ["NDT_WINDOW_PALLAS"] = mode
        for esc in (False, True):
            plan, inv = build(esc)
            out = W.window_conv_apply(
                feats, plan, inv, w, compute_dtype=jnp.bfloat16,
                guard=False,
            )
            gf, gw = jax.grad(
                lambda a, b: jnp.sum(
                    W.window_conv_apply(
                        a, plan, inv, b, compute_dtype=jnp.bfloat16,
                        guard=False,
                    ).astype(jnp.float32) * g_out
                ),
                argnums=(0, 1),
            )(feats, w)
            # d_w-only core (the input_grad=False path)
            gw_only = jax.grad(
                lambda b: jnp.sum(
                    W.window_conv_apply(
                        feats, plan, None, b, compute_dtype=jnp.bfloat16,
                        guard=False, input_grad=False,
                    ).astype(jnp.float32) * g_out
                ),
            )(w)
            results[(mode, esc)] = dict(
                idx=np.asarray(plan.idx), starts=np.asarray(plan.starts),
                n_esc=(
                    int(np.asarray(plan.esc_stats)[2])
                    if plan.esc_stats is not None else -1
                ),
                out=np.asarray(out, np.float32),
                gf=np.asarray(gf, np.float32),
                gw=np.asarray(gw, np.float32),
                gw_only=np.asarray(gw_only, np.float32),
            )

    m = np.asarray(mj)
    for esc in (False, True):
        a, b = results[("1", esc)], results[("0", esc)]
        print(f"-- esc={esc} (n_esc pallas={a['n_esc']} xla={b['n_esc']})")
        print("  starts equal:", bool((a["starts"] == b["starts"]).all()))
        print("  idx equal:   ", bool((a["idx"] == b["idx"]).all()),
              f"(mismatch {int((a['idx'] != b['idx']).sum())}"
              f"/{a['idx'].size})")
        for k in ("out", "gf", "gw", "gw_only"):
            x, y = a[k], b[k]
            if k in ("out", "gf"):
                x, y = x[m], y[m]
            d = np.abs(x - y)
            s = np.abs(y) + 1e-3
            print(
                f"  {k}: max_abs_diff {d.max():.5f} "
                f"max_rel {(d / s).max():.5f}"
            )


if __name__ == "__main__":
    main()
