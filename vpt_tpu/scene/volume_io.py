""".sdf voxel-grid file IO.

Mirrors load_volume (/root/reference/libs/yocto/yocto_sceneio.cpp:885-967):
  - ASCII (SDFGen format): line 1 "w h d", line 2 origin (skipped),
    line 3 voxel resolution, then w*h*d whitespace-separated distances.
  - binary (skanti generator): int32 w,h,d; float32 res; 4x4 float32 matrix
    (read and discarded); then w*h*d float32 distances.

Values are indexed i + j*W + k*W*H, i.e. x-fastest; we store (D, H, W) arrays
indexed [z, y, x].
"""

from __future__ import annotations

import numpy as np


def load_sdf_volume(path: str, binary: bool = False):
    """Returns (whd (3,) int array, values (D,H,W) float32, res float)."""
    if binary:
        with open(path, "rb") as f:
            data = f.read()
        w, h, d = np.frombuffer(data, np.int32, 3, 0)
        res = float(np.frombuffer(data, np.float32, 1, 12)[0])
        # 4x4 transform matrix: read and discarded, like the reference
        offset = 12 + 4 + 64
        values = np.frombuffer(data, np.float32, w * h * d, offset)
    else:
        with open(path) as f:
            text = f.read().split()
        w, h, d = int(text[0]), int(text[1]), int(text[2])
        # tokens 3-5: origin (skipped); token 6: resolution
        res = float(text[6])
        values = np.asarray(text[7:7 + w * h * d], dtype=np.float32)
    if values.size != w * h * d:
        raise ValueError(f"{path}: expected {w * h * d} voxels, got {values.size}")
    return (
        np.array([w, h, d], np.int32),
        values.reshape(d, h, w).astype(np.float32),
        res,
    )


def save_sdf_volume(path: str, whd, values, res, origin=(0.0, 0.0, 0.0)):
    """Write ASCII SDFGen format compatible with the reference parser."""
    w, h, d = int(whd[0]), int(whd[1]), int(whd[2])
    flat = np.asarray(values, np.float32).reshape(-1)
    with open(path, "w") as f:
        f.write(f"{w} {h} {d}\n")
        f.write(f"{origin[0]} {origin[1]} {origin[2]}\n")
        f.write(f"{res}\n")
        np.savetxt(f, flat[:, None], fmt="%.6g")
