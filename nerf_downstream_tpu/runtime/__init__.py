"""Native runtime components (C++ via ctypes).

``plx_scene_load``: one-pass Plenoxel npz decode (ZIP parse, inflate, npy
parse, links->xyz, SH dequantize, fp16 widen) with OpenMP — the native data
path feeding the batcher. Falls back transparently to the numpy decoder
when the shared library hasn't been built (``make -C
nerf_downstream_tpu/runtime``).
"""

from __future__ import annotations

import ctypes
import logging
import os
import subprocess

import numpy as np

_LIB = None
_TRIED = False


def _lib_path() -> str:
    return os.path.join(os.path.dirname(__file__), "libplenoxel_decode.so")


def build(force: bool = False) -> bool:
    """Compile the native library (g++ -O3 -fopenmp -lz)."""
    so = _lib_path()
    src = os.path.join(os.path.dirname(__file__), "plenoxel_decode.cc")
    if os.path.exists(so) and not force:
        if os.path.getmtime(so) >= os.path.getmtime(src):
            return True
    cmd = [
        "g++", "-O3", "-march=native", "-fopenmp", "-shared", "-fPIC",
        src, "-o", so, "-lz",
    ]
    try:
        subprocess.run(cmd, check=True, capture_output=True)
        return True
    except (subprocess.CalledProcessError, FileNotFoundError) as e:
        logging.warning(f"native decoder build failed: {e}")
        return False


def get_lib():
    global _LIB, _TRIED
    if _LIB is not None or _TRIED:
        return _LIB
    _TRIED = True
    so = _lib_path()
    if not os.path.exists(so):
        if not build():
            return None
    try:
        lib = ctypes.CDLL(so)
    except OSError as e:
        logging.warning(f"native decoder load failed: {e}")
        return None
    lib.plx_scene_info.restype = ctypes.c_int
    lib.plx_scene_info.argtypes = [
        ctypes.c_char_p,
        ctypes.POINTER(ctypes.c_int64),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
        ctypes.POINTER(ctypes.c_int32),
    ]
    lib.plx_scene_load.restype = ctypes.c_int
    lib.plx_scene_load.argtypes = [ctypes.c_char_p] + [
        ctypes.c_void_p
    ] * 5
    _LIB = lib
    return _LIB


def native_available() -> bool:
    return get_lib() is not None


def load_scene_native(path: str) -> dict | None:
    """Decode a data.npz natively; returns the plenoxel.load_npz dict shape
    plus pre-decoded ``coords``, or None if the library is unavailable."""
    lib = get_lib()
    if lib is None:
        return None
    n = ctypes.c_int64()
    sh_dim = ctypes.c_int32()
    reso = (ctypes.c_int32 * 3)()
    has_labels = ctypes.c_int32()
    has_dists = ctypes.c_int32()
    rc = lib.plx_scene_info(
        path.encode(), ctypes.byref(n), ctypes.byref(sh_dim), reso,
        ctypes.byref(has_labels), ctypes.byref(has_dists),
    )
    if rc != 0:
        return None
    nv = n.value
    coords = np.empty((nv, 3), np.int32)
    density = np.empty((nv,), np.float32)
    sh = np.empty((nv, sh_dim.value), np.float32)
    labels = np.empty((nv,), np.int32) if has_labels.value else None
    dists = np.empty((nv,), np.float32) if has_dists.value else None
    rc = lib.plx_scene_load(
        path.encode(),
        coords.ctypes.data_as(ctypes.c_void_p),
        density.ctypes.data_as(ctypes.c_void_p),
        sh.ctypes.data_as(ctypes.c_void_p),
        labels.ctypes.data_as(ctypes.c_void_p) if labels is not None else None,
        dists.ctypes.data_as(ctypes.c_void_p) if dists is not None else None,
    )
    if rc != 0:
        return None
    out = {
        "coords": coords,
        "density": density[:, None],
        "sh": sh,
        "reso": np.array([reso[0], reso[1], reso[2]]),
    }
    if labels is not None:
        out["labels"] = labels
    if dists is not None:
        out["dists"] = dists
    return out
