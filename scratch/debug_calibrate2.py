"""Eager-mode reproduction of the calibrated-knobs permute test with
per-plan guard instrumentation: patch window_conv_apply to report every
plan's n_escaped / esc_stats concretely (jax.disable_jit), and the level
poison guard likewise."""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

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


def main():
    import jax

    from nerf_downstream_tpu.models import get_model
    from nerf_downstream_tpu.train.loop import array_batch
    from nerf_downstream_tpu.train.modules import SegmentationTraining
    from nerf_downstream_tpu.ops import window_conv as W

    rng = np.random.default_rng(0)
    batches = _batches(rng, n_batches=1, scenes=3)
    knobs = C.calibrate(batches, tile=64, window=64, permutations=2, seed=2)
    print("knobs:", knobs)
    cfg.parse_config(
        "CoordinateContext.grid_extent = 64\n"
        'CoordinateContext.method = "hybrid"\n'
    )
    C.bind(knobs)

    orig_apply = W.window_conv_apply

    def spy_apply(feats, plan, inv_plan, w, b=None, **kw):
        for name, p in (("fwd", plan), ("inv", inv_plan)):
            try:
                ne = int(np.asarray(p.n_escaped))
            except Exception:
                break  # traced (create_state init) — skip introspection
            st = (
                tuple(int(v) for v in np.asarray(p.esc_stats))
                if p.esc_stats is not None
                else None
            )
            if ne > 0:
                print(
                    f"POISON {name}: n={p.idx.shape} tile={p.tile} "
                    f"window={p.window} blocks={p.blocks} n_escaped={ne} "
                    f"esc_stats={st}"
                )
        return orig_apply(feats, plan, inv_plan, w, b, **kw)

    W.window_conv_apply = spy_apply
    import nerf_downstream_tpu.models.mink.layers as L

    L.window_conv_apply = spy_apply

    from nerf_downstream_tpu.sparse.context import CoordinateContext

    orig_poison = CoordinateContext.level_poison

    def spy_poison(self, coords, feats):
        lost = self._level_overflow.get(id(coords))
        if lost is not None and self.overflow_guard:
            try:
                lv = int(np.asarray(lost))
            except Exception:
                lv = 0  # traced (create_state init) — skip introspection
            if lv > 0:
                print(f"POISON level overflow: coords={coords.shape} lost={lv}")
        return orig_poison(self, coords, feats)

    CoordinateContext.level_poison = spy_poison

    model = get_model(
        name="Res16UNet14", out_channel=8, num_batches=3, planes=(8,) * 8
    )
    task = SegmentationTraining(
        model, optimizer_name="SGD", scheduler_name="none", lr=0.1,
        ignore_label=-100,
    )
    batch = array_batch(batches[0])
    state = task.create_state(jax.random.PRNGKey(0), batch)
    with jax.disable_jit():
        for p in range(3):
            order = np.random.default_rng(p).permutation(3)
            permuted = array_batch(C._permuted(batches[0], order))
            print(f"--- permutation {p} (order {order}) ---")
            logits, _ = task.make_eval_step()(state, permuted)
            print("logits finite:", bool(np.isfinite(np.asarray(logits)).all()))


if __name__ == "__main__":
    main()
