"""Batched 3D vector/frame math on jnp arrays.

All functions operate on arrays whose last axis is the vector dimension
(usually 3), with arbitrary leading batch axes. Frames are rigid transforms
stored as (..., 4, 3): rows x, y, z are the basis, row o is the origin —
mirroring the semantics of the reference `frame3f`
(/root/reference/libs/yocto/yocto_math.h:1059-1162) but in SoA/batched form
suited to XLA vectorization.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

FLT_EPS = float(np.finfo(np.float32).eps)  # 1.1920929e-07, yocto flt_eps
FLT_MAX = float(np.finfo(np.float32).max)
RAY_EPS = 1e-4  # yocto_geometry.h:118 default ray tmin
PIF = float(np.pi)


def dot(a, b):
    return jnp.sum(a * b, axis=-1)


def cross(a, b):
    return jnp.cross(a, b)


def length(a):
    # AD-safe at zero: d/dx sqrt(x) at x=0 is inf, and a NaN/inf cotangent
    # leaks through jnp.where even on the untaken branch (e.g. sd_box's
    # outside term for interior points). Double-where keeps value exact and
    # gradient 0 at the origin.
    s = jnp.sum(a * a, axis=-1)
    pos = s > 0
    return jnp.where(pos, jnp.sqrt(jnp.where(pos, s, 1.0)), 0.0)


def length_squared(a):
    return jnp.sum(a * a, axis=-1)


def distance_squared(a, b):
    return length_squared(a - b)


def normalize(a):
    l = length(a)
    return jnp.where(l[..., None] > 0, a / jnp.where(l[..., None] > 0, l[..., None], 1.0), a)


def vmax(a):
    """max component (yocto max(vec3f))."""
    return jnp.max(a, axis=-1)


def vmean(a):
    return jnp.mean(a, axis=-1)


def vsum(a):
    return jnp.sum(a, axis=-1)


def reflect(w, n):
    """Mirror reflection of direction w about normal n (yocto_math.h:1641)."""
    return -w + 2.0 * dot(n, w)[..., None] * n


def refract(w, n, inv_eta):
    """Refraction; returns 0 on total internal reflection (yocto_math.h:1644).
    sqrt input masked on the TIR branch (infinite sqrt(0) gradient would leak
    NaNs through the where)."""
    cosine = dot(n, w)
    k = 1.0 + inv_eta * inv_eta * (cosine * cosine - 1.0)
    tir = k < 0.0
    root = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(k, 1e-12)))
    out = -w * _b(inv_eta) + (inv_eta * cosine - root)[..., None] * n
    return jnp.where(tir[..., None], 0.0, out)


def _b(x):
    """Broadcast scalar-per-batch value over the vector axis."""
    x = jnp.asarray(x)
    return x[..., None] if x.ndim > 0 else x


def orthonormalize(a, b):
    return normalize(a - b * dot(a, b)[..., None])


def basis_fromz(v):
    """Orthonormal basis with z = normalize(v), branchless Pixar method
    (yocto_math.h:2811). Returns (..., 3, 3) with rows x, y, z."""
    z = normalize(v)
    sign = jnp.where(z[..., 2] >= 0.0, 1.0, -1.0)  # copysignf(1, z.z)
    a = -1.0 / (sign + z[..., 2])
    b = z[..., 0] * z[..., 1] * a
    x = jnp.stack(
        [1.0 + sign * z[..., 0] * z[..., 0] * a, sign * b, -sign * z[..., 0]], axis=-1
    )
    y = jnp.stack([b, sign + z[..., 1] * z[..., 1] * a, -z[..., 1]], axis=-1)
    return jnp.stack([x, y, z], axis=-2)


def basis_apply(basis, v_local):
    """Transform a local direction by a (..., 3, 3) row-basis: sum_i v_i * row_i."""
    return jnp.sum(v_local[..., :, None] * basis, axis=-2)


# ---------------------------------------------------------------------------
# Frames: (..., 4, 3) arrays; rows 0..2 basis x/y/z, row 3 origin.
# ---------------------------------------------------------------------------

def frame_from_flat(vals):
    """Build a frame from the 12-float JSON layout [xx xy xz yx .. oz]."""
    arr = np.asarray(vals, dtype=np.float32).reshape(4, 3)
    return arr


IDENTITY_FRAME = np.array(
    [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], dtype=np.float32
)


def transform_point(frame, p):
    """frame rows (x,y,z,o): p' = x*px + y*py + z*pz + o."""
    rot = frame[..., :3, :]
    return jnp.sum(p[..., :, None] * rot, axis=-2) + frame[..., 3, :]


def transform_direction(frame, d):
    rot = frame[..., :3, :]
    return normalize(jnp.sum(d[..., :, None] * rot, axis=-2))


def transform_vector(frame, d):
    rot = frame[..., :3, :]
    return jnp.sum(d[..., :, None] * rot, axis=-2)


def transform_normal(frame, n):
    """For rigid frames the normal transforms like a direction (yocto uses
    transpose(inverse) only in non-rigid mode; scene frames here are rigid)."""
    return transform_direction(frame, n)


def frame_inverse(frame):
    """Rigid inverse: rot' = rot^T, o' = -(o @ rot')  (yocto_math.h:2948)."""
    rot = frame[..., :3, :]
    rot_t = jnp.swapaxes(rot, -1, -2)
    o = frame[..., 3, :]
    new_o = -jnp.sum(o[..., :, None] * rot_t, axis=-2)
    return jnp.concatenate([rot_t, new_o[..., None, :]], axis=-2)


def np_frame_inverse(frame):
    rot = np.asarray(frame)[:3, :]
    o = np.asarray(frame)[3, :]
    rot_t = rot.T
    new_o = -(o @ rot_t)
    return np.concatenate([rot_t, new_o[None, :]], axis=0).astype(np.float32)


def np_transform_point(frame, p):
    return np.asarray(p) @ np.asarray(frame)[:3, :] + np.asarray(frame)[3, :]


def np_transform_direction(frame, d):
    out = np.asarray(d) @ np.asarray(frame)[:3, :]
    return out / np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-30)


def np_transform_vector(frame, d):
    return np.asarray(d) @ np.asarray(frame)[:3, :]


def interpolate_triangle(p0, p1, p2, uv):
    u = uv[..., 0:1]
    v = uv[..., 1:2]
    return p0 * (1 - u - v) + p1 * u + p2 * v


def interpolate_line(p0, p1, u):
    u = u[..., None]
    return p0 * (1 - u) + p1 * u


def triangle_normal(p0, p1, p2):
    return normalize(cross(p1 - p0, p2 - p0))


def triangle_area(p0, p1, p2):
    return 0.5 * length(cross(p1 - p0, p2 - p0))


def safe_div(a, b, eps=0.0):
    """a / b with 0 where |b| == 0 (guards MIS pdf denominators)."""
    denom_ok = b != 0.0
    return jnp.where(denom_ok, a / jnp.where(denom_ok, b, 1.0), 0.0)
