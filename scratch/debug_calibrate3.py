"""Concrete (outside-jit) replication of the runtime plan chain for the
calibrated-knobs permute test: build the exact level sets + window plans
the model builds (field_to_sparse -> strided chain -> same-set k3 plans +
cross k2 down/up plans) with CONCRETE arrays, and print every overflow
guard value vs its bound cap, per permutation."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

os.environ["JAX_PLATFORMS"] = "cpu"
import jax

# a sitecustomize may have imported jax and registered the remote-TPU
# plugin already — jax snapshots JAX_PLATFORMS at import, so override the
# config directly (same dance as tests/conftest.py)
jax.config.update("jax_platforms", "cpu")

import numpy as np

from nerf_downstream_tpu import config as cfg
from nerf_downstream_tpu.utils import calibrate as C


def _batches(rng, n_batches=1, scenes=3, voxels=600, cap=4096):
    from nerf_downstream_tpu.data.plenoxel import make_synthetic_scene
    from nerf_downstream_tpu.data.utils import collate_mink

    out = []
    for _ in range(n_batches):
        samples = []
        for _ in range(scenes):
            sc = make_synthetic_scene(
                rng, n_voxels=voxels, reso=(64, 64, 64), with_labels=True,
                num_classes=8, surface=True,
            )
            samples.append(
                {
                    "coordinates": sc["coords"].astype(np.float32),
                    "features": np.concatenate(
                        [sc["density"], sc["sh"]], 1
                    ).astype(np.float32),
                    "labels": sc["labels"],
                }
            )
        out.append(collate_mink(samples, capacity=cap))
    return out


def stats(tag, plan, te, e_cap):
    ne = int(np.asarray(plan.n_escaped))
    st = (
        tuple(int(v) for v in np.asarray(plan.esc_stats))
        if plan.esc_stats is not None
        else None
    )
    flag = ""
    if ne > 0:
        flag = " <-- POISON"
    print(f"  {tag}: n_escaped={ne} esc_stats(n_gt,n_dt,n_esc)={st} "
          f"te={te} e_cap={e_cap}{flag}")


def main():
    import jax.numpy as jnp

    from nerf_downstream_tpu.models.interface import process_input
    from nerf_downstream_tpu.sparse import field_to_sparse
    from nerf_downstream_tpu.sparse.context import CoordinateContext
    from nerf_downstream_tpu.sparse.kernels import kernel_offsets

    rng = np.random.default_rng(0)
    batches = _batches(rng, n_batches=1, scenes=3)
    knobs = C.calibrate(batches, tile=64, window=64, permutations=2, seed=2)
    print("knobs:", knobs)
    cfg.parse_config(
        "CoordinateContext.grid_extent = 64\n"
        'CoordinateContext.method = "hybrid"\n'
    )
    C.bind(knobs)

    for p in range(3):
        order = np.random.default_rng(p).permutation(3)
        permuted = C._permuted(batches[0], order)
        print(f"--- permutation {p} (order {order}) ---")
        field = process_input(permuted)
        ctx = CoordinateContext(num_batches=3)
        sv, _ = field_to_sparse(field)
        # level chain: same-set k3 plans (fwd + transpose) at each level,
        # cross k2 down plans fine->coarse, contracting inverse, then the
        # decoder's transpose plans (same cross geometry, cached)
        for li, s in enumerate((1, 2, 4, 8, 16)):
            offs3 = kernel_offsets(3, s)
            plan = ctx.window_plan_direct(sv.coords, sv.mask, offs3, stride=s)
            ctx.window_plan_direct(
                sv.coords, sv.mask, offs3, transpose=True, stride=s
            )
            te = min(ctx.escape_tiles_for(s), plan.starts.shape[0] * plan.starts.shape[1])
            e_cap = ctx.escape_cap_for(s)
            print(f" level s={s} cap={sv.capacity} "
                  f"n_valid={int(np.asarray(jnp.sum(sv.mask)))}")
            stats(f"same-set s{s}", plan, te, e_cap)
            lost = ctx._level_overflow.get(id(sv.coords))
            if lost is not None:
                lv = int(np.asarray(lost))
                print(f"  level_overflow lost={lv}" + (" <-- POISON" if lv else ""))
            if s == 16:
                break
            offs2 = kernel_offsets(2, s)
            out_sv = ctx.strided(sv, 2)
            dplan = ctx.window_plan_cross(sv, out_sv, offs2, expanding=True)
            stats(f"down s{s}->s{2*s} (expanding)", dplan, "-", "-")
            iplan = ctx.window_plan_cross(out_sv, sv, offs2, transpose=True)
            stats(f"down-inv s{2*s}->s{s} (contract)", iplan, "-", "-")
            sv = out_sv


if __name__ == "__main__":
    main()
