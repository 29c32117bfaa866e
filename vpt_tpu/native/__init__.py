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
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_int64, ctypes.c_void_p,
            ctypes.c_void_p, ctypes.c_void_p,
            ctypes.POINTER(ctypes.c_int64), ctypes.POINTER(ctypes.c_int64)]
        lib.bvh_build4.restype = ctypes.c_int32
        lib.bvh_traverse.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_float, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_void_p,
            ctypes.c_void_p]
        lib.bvh_traverse.restype = None
        lib.bvh_pdf_accum.argtypes = [
            ctypes.c_void_p, ctypes.c_void_p, ctypes.c_int64, ctypes.c_int32,
            ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p, ctypes.c_float,
            ctypes.c_void_p]
        lib.bvh_pdf_accum.restype = None
        lib.alias_build.argtypes = [
            ctypes.c_void_p, ctypes.c_int64, ctypes.c_void_p, ctypes.c_void_p]
        lib.alias_build.restype = None
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


def bvh_build4(tri_pos: np.ndarray, leaf_size: int = 4):
    """Native 4-wide BVH build; returns (node_rec, leaf_rec, root, perm) or
    None when unavailable. Bit-identical to ops/bvh.py::build_bvh."""
    lib = _load() if _enabled() else None
    if lib is None:
        return None
    T = tri_pos.shape[0]
    ls = int(leaf_size)
    tp = np.ascontiguousarray(tri_pos.reshape(T, 9), np.float32)
    node_rec = np.zeros((max(T, 1), 32), np.float32)
    leaf_rec = np.zeros((max(T, 1), ls * 10), np.float32)
    perm = np.zeros(T, np.int64)
    nn = ctypes.c_int64(0)
    nl = ctypes.c_int64(0)
    root = lib.bvh_build4(
        tp.ctypes.data, T, ls, node_rec.ctypes.data, leaf_rec.ctypes.data,
        perm.ctypes.data, ctypes.byref(nn), ctypes.byref(nl))
    n_nodes = max(nn.value, 1)
    n_leaves = max(nl.value, 1)
    return (node_rec[:n_nodes].copy(), leaf_rec[:n_leaves].copy(),
            np.int32(root), perm)


def bvh_traverse(node_rec, leaf_rec, root, ray_o, ray_d, tmax, tmin):
    """Native multithreaded closest-hit traversal; returns
    (t, tri, u, v) numpy arrays or None when unavailable."""
    lib = _load() if _enabled() else None
    if lib is None:
        return None
    node_rec = np.ascontiguousarray(node_rec, np.float32)
    leaf_rec = np.ascontiguousarray(leaf_rec, np.float32)
    ls = leaf_rec.shape[1] // 10
    R = ray_o.shape[0]
    o = np.ascontiguousarray(ray_o, np.float32)
    d = np.ascontiguousarray(ray_d, np.float32)
    tm = np.ascontiguousarray(tmax, np.float32)
    out_t = np.empty(R, np.float32)
    out_tri = np.empty(R, np.int32)
    out_u = np.empty(R, np.float32)
    out_v = np.empty(R, np.float32)
    lib.bvh_traverse(
        node_rec.ctypes.data, leaf_rec.ctypes.data, ls, int(root), R,
        o.ctypes.data, d.ctypes.data, tm.ctypes.data, float(tmin),
        out_t.ctypes.data, out_tri.ctypes.data, out_u.ctypes.data,
        out_v.ctypes.data)
    return out_t, out_tri, out_u, out_v


def bvh_pdf_accum(node_rec, leaf_rec, root, ray_o, ray_d, tmin):
    """Native all-hits solid-angle pdf accumulation (light_pdf_bvh twin);
    returns (R,) numpy float32 or None when unavailable."""
    lib = _load() if _enabled() else None
    if lib is None:
        return None
    node_rec = np.ascontiguousarray(node_rec, np.float32)
    leaf_rec = np.ascontiguousarray(leaf_rec, np.float32)
    ls = leaf_rec.shape[1] // 10
    R = ray_o.shape[0]
    o = np.ascontiguousarray(ray_o, np.float32)
    d = np.ascontiguousarray(ray_d, np.float32)
    out = np.empty(R, np.float32)
    lib.bvh_pdf_accum(
        node_rec.ctypes.data, leaf_rec.ctypes.data, ls, int(root), R,
        o.ctypes.data, d.ctypes.data, float(tmin), out.ctypes.data)
    return out


def alias_build(weights: np.ndarray):
    """Walker/Vose alias table for a categorical distribution; returns
    (alias_idx int32, cut float32) or None when unavailable."""
    lib = _load() if _enabled() else None
    if lib is None:
        return None
    w = np.ascontiguousarray(weights, np.float32)
    n = w.shape[0]
    alias = np.empty(n, np.int32)
    cut = np.empty(n, np.float32)
    lib.alias_build(w.ctypes.data, n, alias.ctypes.data, cut.ctypes.data)
    return alias, cut
