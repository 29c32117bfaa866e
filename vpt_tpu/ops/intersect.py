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


def intersect_points_brute(ray_o, ray_d, pts, radii, tmin, tmax):
    """Closest hit of (R,) rays against all (P,) point primitives, mirroring
    intersect_point (yocto_geometry.h:683-701): a point is a radius-r disk
    facing the ray (line-point minimum distance test), uv = (0, 0).
    Returns dict(hit, dist, prim)."""
    w = pts[None, :, :] - ray_o[:, None, :]
    dd = dot(ray_d, ray_d)[:, None]
    t = jnp.sum(w * ray_d[:, None, :], axis=-1) / dd
    rp = ray_o[:, None, :] + ray_d[:, None, :] * t[..., None]
    prp = pts[None] - rp
    hit = ((t >= tmin) & (t <= tmax[:, None])
           & (jnp.sum(prp * prp, axis=-1) <= radii[None] ** 2))
    t = jnp.where(hit, t, FLT_MAX)
    k = jnp.argmin(t, axis=-1)
    best_t = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
    any_hit = jnp.any(hit, axis=-1)
    return {
        "hit": any_hit,
        "dist": jnp.where(any_hit, best_t, FLT_MAX),
        "prim": jnp.where(any_hit, k.astype(jnp.int32), -1),
    }


def intersect_lines_brute(ray_o, ray_d, p0, p1, r0, r1, tmin, tmax):
    """Closest hit of (R,) rays against all (L,) line segments, mirroring
    intersect_line (yocto_geometry.h:704-747): ray-segment closest-approach
    solve, radius lerped along the segment, uv = (s, dist/r).
    Returns dict(hit, dist, prim, uv)."""
    u = ray_d[:, None, :]
    v = (p1 - p0)[None]
    w = ray_o[:, None, :] - p0[None]
    a = jnp.sum(u * u, axis=-1)
    b = jnp.sum(u * v, axis=-1)
    c = jnp.sum(v * v, axis=-1)
    d = jnp.sum(u * w, axis=-1)
    e = jnp.sum(v * w, axis=-1)
    det = a * c - b * b
    ok = det != 0.0
    inv = 1.0 / jnp.where(ok, det, 1.0)
    t = (b * e - c * d) * inv
    s = jnp.clip((a * e - b * d) * inv, 0.0, 1.0)
    pr = ray_o[:, None, :] + ray_d[:, None, :] * t[..., None]
    pl = p0[None] + (p1 - p0)[None] * s[..., None]
    prl = pr - pl
    d2 = jnp.sum(prl * prl, axis=-1)
    r = r0[None] * (1 - s) + r1[None] * s
    hit = ok & (t >= tmin) & (t <= tmax[:, None]) & (d2 <= r * r)
    t = jnp.where(hit, t, FLT_MAX)
    k = jnp.argmin(t, axis=-1)
    best_t = jnp.take_along_axis(t, k[:, None], axis=-1)[:, 0]
    best_s = jnp.take_along_axis(s, k[:, None], axis=-1)[:, 0]
    uv_y = jnp.sqrt(jnp.maximum(d2, 0.0)) / jnp.maximum(r, 1e-30)
    best_uvy = jnp.take_along_axis(uv_y, k[:, None], axis=-1)[:, 0]
    any_hit = jnp.any(hit, axis=-1)
    return {
        "hit": any_hit,
        "dist": jnp.where(any_hit, best_t, FLT_MAX),
        "prim": jnp.where(any_hit, k.astype(jnp.int32), -1),
        "uv": jnp.stack([best_s, best_uvy], axis=-1),
    }


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
