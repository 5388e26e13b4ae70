"""Persistent XLA/Mosaic compilation cache for every product entry point.

A fresh compile of the flagship 64k-row training program carries ~50
distinct Mosaic window-kernel variants (per level capacity x channel pair)
and takes minutes on a small host; with the persistent cache the second
run of the same config loads in seconds. The reference has no analog (its
CUDA kernels ship precompiled); for this framework the cache IS the
precompiled-kernel story, so the Trainer and all CLIs enable it by
default.

Opt out (or relocate) with ``NDT_COMPILE_CACHE=0`` / ``=path``.
"""

from __future__ import annotations

import os

_ENABLED = False


def enable_compilation_cache(path: str | None = None) -> str | None:
    """Idempotently point JAX's persistent compilation cache at ``path``
    (default ``$NDT_COMPILE_CACHE`` or ``~/.cache/ndt_jax``). Returns the
    active path, or None when disabled via ``NDT_COMPILE_CACHE=0``."""
    global _ENABLED
    env = os.environ.get("NDT_COMPILE_CACHE")
    if env == "0":
        return None
    path = path or env or os.path.expanduser("~/.cache/ndt_jax")
    if _ENABLED:
        return path
    import jax

    try:
        os.makedirs(path, exist_ok=True)
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 2.0)
        _ENABLED = True
    except Exception:
        return None
    return path
