"""ctypes bindings for the native host helpers (vpt_native.cpp).

Compiled on demand with g++ -O3 into this directory (rebuilt when the
source is newer than the .so). Falls back cleanly: callers check
`available()` and keep their pure-Python path when the toolchain is missing.
Set VPT_NATIVE=0 to force the Python paths (used by tests to compare both).
"""

from __future__ import annotations

import ctypes
import os
import subprocess
import threading

import numpy as np

_DIR = os.path.dirname(os.path.abspath(__file__))
_SRC = os.path.join(_DIR, "vpt_native.cpp")
_SO = os.path.join(_DIR, "vpt_native.so")
_lock = threading.Lock()
_lib = None
_tried = False


def _build() -> bool:
    cmd = ["g++", "-O3", "-shared", "-fPIC", "-std=c++17", _SRC, "-o",
           _SO + ".tmp"]
    try:
        subprocess.run(cmd, check=True, capture_output=True, timeout=120)
    except Exception:
        return False
    os.replace(_SO + ".tmp", _SO)
    return True


def _load():
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        try:
            stale = (not os.path.exists(_SO)
                     or os.path.getmtime(_SO) < os.path.getmtime(_SRC))
            if stale and not _build():
                return None
            lib = ctypes.CDLL(_SO)
        except OSError:
            return None
        lib.png_unfilter.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64,
            ctypes.c_int64, ctypes.c_int64]
        lib.png_unfilter.restype = None
        lib.bvh_build4.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.POINTER(ctypes.c_int64),
            ctypes.POINTER(ctypes.c_int64)]
        lib.bvh_build4.restype = ctypes.c_int32
        _lib = lib
        return _lib


def _enabled() -> bool:
    # checked per call so tests can toggle the Python paths dynamically
    return os.environ.get("VPT_NATIVE", "1") != "0"


def available() -> bool:
    return _enabled() and _load() is not None


def png_unfilter(scan: np.ndarray, filters: np.ndarray, bpp: int) -> bool:
    """In-place PNG defilter of scan (H, row_bytes) uint8. Returns False if
    the native library is unavailable (caller falls back)."""
    lib = _load() if _enabled() else None
    if lib is None:
        return False
    assert scan.flags.c_contiguous and scan.dtype == np.uint8
    filters = np.ascontiguousarray(filters, np.uint8)
    lib.png_unfilter(
        scan.ctypes.data, filters.ctypes.data,
        scan.shape[0], scan.shape[1], int(bpp))
    return True


def bvh_build4(tri_pos: np.ndarray):
    """Native 4-wide BVH build; returns (node_rec, leaf_rec, root, perm) or
    None when unavailable. Bit-identical to ops/bvh.py::build_bvh."""
    lib = _load() if _enabled() else None
    if lib is None:
        return None
    T = tri_pos.shape[0]
    tp = np.ascontiguousarray(tri_pos.reshape(T, 9), np.float32)
    node_rec = np.zeros((max(T, 1), 32), np.float32)
    leaf_rec = np.zeros((max(T, 1), 40), np.float32)
    perm = np.zeros(T, np.int64)
    nn = ctypes.c_int64(0)
    nl = ctypes.c_int64(0)
    root = lib.bvh_build4(
        tp.ctypes.data, T, node_rec.ctypes.data, leaf_rec.ctypes.data,
        perm.ctypes.data, ctypes.byref(nn), ctypes.byref(nl))
    n_nodes = max(nn.value, 1)
    n_leaves = max(nl.value, 1)
    return (node_rec[:n_nodes].copy(), leaf_rec[:n_leaves].copy(),
            np.int32(root), perm)
