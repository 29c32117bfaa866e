"""STL shape loader (binary + ASCII).

Mirrors the reference's STL support (load_stl / stl_to_triangles,
/root/reference/libs/yocto/yocto_modelio.{h,cpp}: `stl_model` :414 and
yocto_sceneio.cpp:1040-1051): STL carries only triangle soup — positions are
de-duplicated per file load the same way yocto does (exact-match weld), and
per-face normals are discarded (recomputed downstream from geometry).
"""

from __future__ import annotations

import struct

import numpy as np


def _weld(tri_pts: np.ndarray):
    """Exact-match vertex weld: (T*3, 3) points -> (positions, triangles)."""
    flat = tri_pts.reshape(-1, 3)
    _, first, inv = np.unique(flat.round(decimals=7), axis=0,
                              return_index=True, return_inverse=True)
    positions = flat[first].astype(np.float32)
    triangles = inv.reshape(-1, 3).astype(np.int64)
    return positions, triangles


def load_stl(path: str):
    """Returns dict(positions (V,3) f32, triangles (T,3) i64, quads (0,4))."""
    with open(path, "rb") as f:
        data = f.read()
    is_ascii = data[:5] == b"solid" and b"facet" in data[:4096]
    if is_ascii:
        pts = []
        for line in data.decode("utf-8", "replace").splitlines():
            tok = line.split()
            if len(tok) == 4 and tok[0] == "vertex":
                pts.append([float(tok[1]), float(tok[2]), float(tok[3])])
        tri_pts = np.asarray(pts, np.float32)
        if tri_pts.size == 0 or len(tri_pts) % 3:
            raise ValueError(f"malformed ASCII STL: {path}")
        tri_pts = tri_pts.reshape(-1, 3, 3)
    else:
        if len(data) < 84:
            raise ValueError(f"truncated STL: {path}")
        (ntri,) = struct.unpack_from("<I", data, 80)
        need = 84 + ntri * 50
        if len(data) < need:
            raise ValueError(f"truncated binary STL: {path}")
        rec = np.frombuffer(data, np.uint8, count=ntri * 50, offset=84)
        rec = rec.reshape(ntri, 50)
        tri_pts = (
            rec[:, 12:48].copy().view(np.float32).reshape(ntri, 3, 3))
    positions, triangles = _weld(tri_pts)
    return {
        "positions": positions,
        "triangles": triangles,
        "quads": np.zeros((0, 4), np.int64),
        "normals": np.zeros((0, 3), np.float32),
        "texcoords": np.zeros((0, 2), np.float32),
        "colors": np.zeros((0, 4), np.float32),
    }


def save_stl(path: str, positions: np.ndarray, triangles: np.ndarray):
    """Binary STL writer (yocto_modelio save_stl equivalent)."""
    tri = positions[triangles].astype(np.float32)  # (T, 3, 3)
    e1 = tri[:, 1] - tri[:, 0]
    e2 = tri[:, 2] - tri[:, 0]
    n = np.cross(e1, e2)
    ln = np.linalg.norm(n, axis=-1, keepdims=True)
    n = np.where(ln > 0, n / np.maximum(ln, 1e-30), 0.0).astype(np.float32)
    T = len(tri)
    rec = np.zeros((T, 50), np.uint8)
    rec[:, 0:12] = n.view(np.uint8).reshape(T, 12)
    rec[:, 12:48] = tri.reshape(T, 9).view(np.uint8).reshape(T, 36)
    with open(path, "wb") as f:
        f.write(b"\0" * 80)
        f.write(struct.pack("<I", T))
        f.write(rec.tobytes())
