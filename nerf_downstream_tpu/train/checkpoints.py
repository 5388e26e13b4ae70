"""Checkpoint save/load with the reference's policy surface.

Reference (SURVEY §5): Lightning ``.ckpt`` files holding ``state_dict`` +
``optimizer_states``; policies: full resume, ``load_weights`` (state_dict
only), ``load_optimizers`` (optimizer state, LR restarted), and
``transfer_self_supervised`` (drop predictor/final keys —
lightning_module_base.py:59-68). Saving keeps top-1-on-monitor + last
(train.py:158-166).

Format here: flax msgpack state-dict in a single file — structurally the
same split (model state vs optimizer state) so the three load modes map 1:1.
"""

from __future__ import annotations

import os
from typing import Any

import flax.serialization as fser
import jax
import numpy as np


def _host(tree):
    return jax.tree_util.tree_map(lambda x: np.asarray(x), tree)


def save_checkpoint(path: str, state, meta: dict | None = None):
    obj = {
        "state_dict": fser.to_state_dict(
            {"params": _host(state.params), "batch_stats": _host(state.batch_stats)}
        ),
        "optimizer_states": fser.to_state_dict(_host(state.opt_state)),
        "global_step": int(state.step),
        "meta": meta or {},
    }
    os.makedirs(os.path.dirname(os.path.abspath(path)), exist_ok=True)
    with open(path, "wb") as f:
        f.write(fser.msgpack_serialize(obj))


def load_checkpoint_raw(path: str) -> dict:
    with open(path, "rb") as f:
        return fser.msgpack_restore(f.read())


def load_checkpoint(path: str) -> dict:
    """Returns {"params": raw, "batch_stats": raw, "opt_state": raw,
    "global_step": int} — raw state-dicts to be bound to a target with
    ``from_state_dict``."""
    obj = load_checkpoint_raw(path)
    sd = obj.get("state_dict", {})
    return {
        "params": sd.get("params", {}),
        "batch_stats": sd.get("batch_stats", {}),
        "opt_state": obj.get("optimizer_states", {}),
        "global_step": obj.get("global_step", 0),
    }


def restore_into(state, raw: dict, *, weights=True, optimizer=False):
    """Bind raw state-dicts onto a TrainState's structure."""
    new = state
    if weights:
        params = fser.from_state_dict(state.params, raw["params"])
        bs = (
            fser.from_state_dict(state.batch_stats, raw["batch_stats"])
            if raw.get("batch_stats") is not None and state.batch_stats
            else state.batch_stats
        )
        new = new.replace(params=params, batch_stats=bs)
    if optimizer and raw.get("opt_state"):
        new = new.replace(
            opt_state=fser.from_state_dict(state.opt_state, raw["opt_state"])
        )
    return new


def convert_self_supervised(raw_params, raw_stats, target_params, target_stats):
    """Key-rewrite transfer: drop 'predictor'/'final' branches, keep the rest
    where shapes match (reference convert_self_supervised_checkpoint)."""

    def merge(raw: Any, target: Any, path: str = ""):
        if not isinstance(target, dict):
            if raw is None:
                return target
            raw_arr = np.asarray(raw)
            tgt_arr = np.asarray(target)
            return raw_arr if raw_arr.shape == tgt_arr.shape else target
        out = {}
        for k, v in target.items():
            if "final" in k or "predictor" in k:
                out[k] = v
                continue
            sub = raw.get(k) if isinstance(raw, dict) else None
            out[k] = merge(sub, v, path + "/" + k)
        return out

    p = merge(fser.to_state_dict(raw_params), fser.to_state_dict(target_params))
    s = merge(fser.to_state_dict(raw_stats), fser.to_state_dict(target_stats))
    return (
        fser.from_state_dict(target_params, p),
        fser.from_state_dict(target_stats, s),
    )
