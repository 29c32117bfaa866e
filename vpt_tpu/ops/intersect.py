"""Ray-primitive intersections, batched (Möller-Trumbore).

Semantics match yocto intersect_triangle
(/root/reference/libs/yocto/yocto_geometry.h:786-819): det==0 rejected,
barycentric bounds, t in [tmin, tmax]. Quads were split into triangles at
flatten time with the exact (p0,p1,p3)/(p2,p3,p1) decomposition the reference
uses (yocto_geometry.h:822-838), so triangle intersection covers everything.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import FLT_MAX, cross, dot


def intersect_triangles_one(ray_o, ray_d, p0, p1, p2, tmin, tmax):
    """Broadcasted single-pass Möller-Trumbore.

    ray_o/ray_d broadcast against p0/p1/p2 (e.g. (R,1,3) vs (R,K,3)).
    Returns (t, uv, hit_mask)."""
    edge1 = p1 - p0
    edge2 = p2 - p0
    pvec = cross(ray_d, edge2)
    det = dot(edge1, pvec)
    ok = det != 0.0
    inv_det = 1.0 / jnp.where(ok, det, 1.0)
    tvec = ray_o - p0
    u = dot(tvec, pvec) * inv_det
    qvec = cross(tvec, edge1)
    v = dot(ray_d, qvec) * inv_det
    t = dot(edge2, qvec) * inv_det
    hit = ok & (u >= 0.0) & (u <= 1.0) & (v >= 0.0) & (u + v <= 1.0)
    hit = hit & (t >= tmin) & (t <= tmax)
    uv = jnp.stack([u, v], axis=-1)
    return jnp.where(hit, t, FLT_MAX), uv, hit


def intersect_tris_brute(ray_o, ray_d, tri_pos, tmin, tmax):
    """Brute-force closest hit of (R,) rays against all (T,) triangles.

    Memory-heavy (R*T) — used as the golden reference for BVH validation and
    for small primitive sets (light meshes in sample_lights_pdf).
    Returns dict(hit, dist, tri, uv)."""
    p0 = tri_pos[None, :, 0, :]
    p1 = tri_pos[None, :, 1, :]
    p2 = tri_pos[None, :, 2, :]
    t, uv, hit = intersect_triangles_one(
        ray_o[:, None, :], ray_d[:, None, :], p0, p1, p2, tmin,
        jnp.broadcast_to(jnp.asarray(tmax)[..., None], (ray_o.shape[0], tri_pos.shape[0])),
    )
    t = jnp.where(hit, t, FLT_MAX)
    k = jnp.argmin(t, axis=-1)
    best_t = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
    best_uv = jnp.take_along_axis(uv, k[:, None, None], axis=-2)[:, 0, :]
    any_hit = jnp.any(hit, axis=-1)
    return {
        "hit": any_hit,
        "dist": jnp.where(any_hit, best_t, FLT_MAX),
        "tri": jnp.where(any_hit, k.astype(jnp.int32), -1),
        "uv": best_uv,
    }
