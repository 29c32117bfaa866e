"""Mesh -> SDF voxel grid generation.

The reference scenes 06/07 reference `sdfs/sackboy.sdf` and `sdfs/bunny.sdf`
which are NOT checked into the reference repo (BASELINE.md) — the grids must
be synthesized. `mesh_to_sdf` computes a signed distance grid from a triangle
mesh: unsigned distance by exact point-triangle distance over all triangles
(vectorized, chunked), sign by ray-parity voting along 3 axes using the
renderer's own intersection code.

Grid convention matches eval_sdf (/root/reference/libs/yocto/yocto_sdfs.cpp:
30-49): the grid spans [0, res*whd] in local coordinates, voxel (i,j,k)
sampling position is the cell-uniform trilinear lattice over that box.
"""

from __future__ import annotations

import os

import numpy as np


def point_triangle_distance(p, a, b, c):
    """Exact unsigned distance from points p (N,3) to triangles (T,3) given as
    a/b/c (T,3) — broadcast over (N,T). Chunk externally to bound memory."""
    ab = b - a
    ac = c - a
    ap = p[:, None, :] - a[None, :, :]
    d1 = np.einsum("tk,ntk->nt", ab, ap)
    d2 = np.einsum("tk,ntk->nt", ac, ap)
    bp = p[:, None, :] - b[None, :, :]
    d3 = np.einsum("tk,ntk->nt", ab, bp)
    d4 = np.einsum("tk,ntk->nt", ac, bp)
    cp = p[:, None, :] - c[None, :, :]
    d5 = np.einsum("tk,ntk->nt", ab, cp)
    d6 = np.einsum("tk,ntk->nt", ac, cp)

    # region tests (Ericson, Real-Time Collision Detection 5.1.5)
    va = d3 * d6 - d5 * d4
    vb = d5 * d2 - d1 * d6
    vc = d1 * d4 - d3 * d2
    denom_v = vb + vc + va
    safe = lambda x: np.where(np.abs(x) < 1e-30, 1e-30, x)

    # vertex regions
    closest = np.empty(ap.shape, np.float32)
    # default: interior
    v_i = vb / safe(denom_v)
    w_i = vc / safe(denom_v)
    closest = a[None] + v_i[..., None] * ab[None] + w_i[..., None] * ac[None]
    # edge AC
    w_ac = np.clip(d2 / safe(d2 - d6), 0, 1)
    m_ac = (vb <= 0) & (d2 >= 0) & (d6 <= 0)
    closest = np.where(m_ac[..., None], a[None] + w_ac[..., None] * ac[None], closest)
    # edge BC
    w_bc = np.clip((d4 - d3) / safe((d4 - d3) + (d5 - d6)), 0, 1)
    m_bc = (va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0)
    closest = np.where(
        m_bc[..., None], b[None] + w_bc[..., None] * (c - b)[None], closest
    )
    # edge AB
    v_ab = np.clip(d1 / safe(d1 - d3), 0, 1)
    m_ab = (vc <= 0) & (d1 >= 0) & (d3 <= 0)
    closest = np.where(m_ab[..., None], a[None] + v_ab[..., None] * ab[None], closest)
    # vertices
    m_c = (d6 >= 0) & (d5 <= d6)
    closest = np.where(m_c[..., None], c[None, :, :], closest)
    m_b = (d3 >= 0) & (d4 <= d3)
    closest = np.where(m_b[..., None], b[None, :, :], closest)
    m_a = (d1 <= 0) & (d2 <= 0)
    closest = np.where(m_a[..., None], a[None, :, :], closest)

    return np.linalg.norm(p[:, None, :] - closest, axis=-1).min(axis=1)


def mesh_to_sdf(positions, triangles, dims=(64, 64, 64), padding=0.05,
                use_jax=True):
    """Returns (whd, values (D,H,W), res, offset): grid over the mesh bbox with
    `padding` relative margin; `offset` is the world position of grid corner
    (0,0,0) — bake it into the instance frame or mesh before use."""
    pos = np.asarray(positions, np.float32)
    tris = np.asarray(triangles, np.int64)
    lo = pos.min(axis=0)
    hi = pos.max(axis=0)
    extent = hi - lo
    lo = lo - extent * padding
    hi = hi + extent * padding
    size = hi - lo
    w, h, d = dims
    res = float(size.max() / (max(dims) - 1))
    # lattice matching eval_volume: voxel (i,j,k) at uvw in [-1,1] over the box
    xs = lo[0] + size[0] * np.arange(w) / (w - 1)
    ys = lo[1] + size[1] * np.arange(h) / (h - 1)
    zs = lo[2] + size[2] * np.arange(d) / (d - 1)
    Z, Y, X = np.meshgrid(zs, ys, xs, indexing="ij")
    pts = np.stack([X, Y, Z], axis=-1).reshape(-1, 3).astype(np.float32)

    a, b, c = pos[tris[:, 0]], pos[tris[:, 1]], pos[tris[:, 2]]
    if use_jax:
        dist, sign = _jax_distance_and_sign(pts, a, b, c)
    else:
        dist = np.empty(pts.shape[0], np.float32)
        chunk = max(1, int(2e7 // max(len(tris), 1)))
        for s in range(0, pts.shape[0], chunk):
            dist[s:s + chunk] = point_triangle_distance(pts[s:s + chunk], a, b, c)
        sign = _raycast_sign_numpy(pts, a, b, c)
    values = (dist * sign).reshape(d, h, w).astype(np.float32)
    return np.array([w, h, d], np.int32), values, res, lo.astype(np.float32)


# fixed generic unit directions for inside/outside parity voting
_SIGN_DIRS = (
    np.array([0.8501580, 0.3312001, 0.4096041], np.float32),
    np.array([-0.2771198, 0.9198879, -0.2776201], np.float32),
    np.array([0.3310022, -0.4372019, 0.8362012], np.float32),
)


def _jax_distance_and_sign(pts, a, b, c):
    """Distance+sign, chunked over BOTH points and triangles (lax.scan over
    triangle blocks) so intermediates stay (P_CHUNK, T_CHUNK)-sized."""
    import jax
    import jax.numpy as jnp

    from ..ops.intersect import intersect_triangles_one

    T_CHUNK = 4096
    P_CHUNK = 2048
    T = a.shape[0]
    t_pad = ((T + T_CHUNK - 1) // T_CHUNK) * T_CHUNK
    # pad with far-away degenerate triangles (never closest, never hit)
    far = np.full((t_pad - T, 3), 1e9, np.float32)
    a_p = jnp.asarray(np.concatenate([a, far]).reshape(-1, T_CHUNK, 3))
    b_p = jnp.asarray(np.concatenate([b, far]).reshape(-1, T_CHUNK, 3))
    c_p = jnp.asarray(np.concatenate([c, far]).reshape(-1, T_CHUNK, 3))

    @jax.jit
    def chunk_fn(p):
        def tri_block(carry, abc):
            best, hits = carry
            a_j, b_j, c_j = abc
            ab, ac = b_j - a_j, c_j - a_j
            ap = p[:, None, :] - a_j[None]
            d1 = jnp.einsum("tk,ntk->nt", ab, ap)
            d2 = jnp.einsum("tk,ntk->nt", ac, ap)
            bp = p[:, None, :] - b_j[None]
            d3 = jnp.einsum("tk,ntk->nt", ab, bp)
            d4 = jnp.einsum("tk,ntk->nt", ac, bp)
            cp = p[:, None, :] - c_j[None]
            d5 = jnp.einsum("tk,ntk->nt", ab, cp)
            d6 = jnp.einsum("tk,ntk->nt", ac, cp)
            va = d3 * d6 - d5 * d4
            vb = d5 * d2 - d1 * d6
            vc = d1 * d4 - d3 * d2
            safe = lambda x: jnp.where(jnp.abs(x) < 1e-30, 1e-30, x)
            v_i = vb / safe(va + vb + vc)
            w_i = vc / safe(va + vb + vc)
            closest = a_j[None] + v_i[..., None] * ab[None] + w_i[..., None] * ac[None]
            w_ac = jnp.clip(d2 / safe(d2 - d6), 0, 1)
            closest = jnp.where(((vb <= 0) & (d2 >= 0) & (d6 <= 0))[..., None],
                                a_j[None] + w_ac[..., None] * ac[None], closest)
            w_bc = jnp.clip((d4 - d3) / safe((d4 - d3) + (d5 - d6)), 0, 1)
            closest = jnp.where(
                ((va <= 0) & ((d4 - d3) >= 0) & ((d5 - d6) >= 0))[..., None],
                b_j[None] + w_bc[..., None] * (c_j - b_j)[None], closest)
            v_ab = jnp.clip(d1 / safe(d1 - d3), 0, 1)
            closest = jnp.where(((vc <= 0) & (d1 >= 0) & (d3 <= 0))[..., None],
                                a_j[None] + v_ab[..., None] * ab[None], closest)
            closest = jnp.where(((d6 >= 0) & (d5 <= d6))[..., None], c_j[None], closest)
            closest = jnp.where(((d3 >= 0) & (d4 <= d3))[..., None], b_j[None], closest)
            closest = jnp.where(((d1 <= 0) & (d2 <= 0))[..., None], a_j[None], closest)
            dist = jnp.linalg.norm(p[:, None, :] - closest, axis=-1).min(axis=1)

            # parity hit-counts along 3 fixed generic (non-axis-aligned)
            # directions; majority vote at the end. Generic directions make
            # shared-edge grazes (which double-count and flip parity)
            # measure-zero even on axis-aligned meshes.
            new_hits = []
            for k3, dirv in enumerate(_SIGN_DIRS):
                dira = jnp.broadcast_to(jnp.asarray(dirv), p.shape)
                _, _, hitm = intersect_triangles_one(
                    p[:, None, :], dira[:, None, :], a_j[None], b_j[None],
                    c_j[None], 0.0, jnp.inf)
                new_hits.append(hits[k3] + jnp.sum(hitm, axis=1).astype(jnp.int32))
            return (jnp.minimum(best, dist), tuple(new_hits)), None

        init = (jnp.full(p.shape[0], jnp.inf),
                tuple(jnp.zeros(p.shape[0], jnp.int32) for _ in range(3)))
        (dist, hits), _ = jax.lax.scan(tri_block, init, (a_p, b_p, c_p))
        inside_votes = sum((h % 2).astype(jnp.int32) for h in hits)
        sign = jnp.where(inside_votes >= 2, -1.0, 1.0)
        return dist, sign

    n = pts.shape[0]
    dist = np.empty(n, np.float32)
    sign = np.empty(n, np.float32)
    pad_n = ((n + P_CHUNK - 1) // P_CHUNK) * P_CHUNK
    pts_pad = np.concatenate([pts, np.zeros((pad_n - n, 3), np.float32)])
    for s in range(0, pad_n, P_CHUNK):
        d_c, s_c = chunk_fn(jnp.asarray(pts_pad[s:s + P_CHUNK]))
        e = min(s + P_CHUNK, n)
        if s < n:
            dist[s:e] = np.asarray(d_c)[: e - s]
            sign[s:e] = np.asarray(s_c)[: e - s]
    return dist, sign


def _raycast_sign_numpy(pts, a, b, c):
    # parity voting along the 3 generic directions (slow; jax path preferred)
    votes = np.zeros(pts.shape[0], np.int32)
    chunk = max(1, int(2e7 // max(len(a), 1)))
    e1, e2 = b - a, c - a
    for d in _SIGN_DIRS:
        # Möller-Trumbore vectorized over triangles per point chunk
        pvec = np.cross(d, e2)
        det = np.einsum("tk,tk->t", e1, pvec)
        ok = np.abs(det) > 1e-12
        inv = np.where(ok, 1.0 / np.where(ok, det, 1), 0)
        for s in range(0, pts.shape[0], chunk):
            p = pts[s:s + chunk]
            tvec = p[:, None, :] - a[None]
            u = np.einsum("ntk,tk->nt", tvec, pvec) * inv[None]
            qvec = np.cross(tvec, e1[None])
            v = np.einsum("ntk,k->nt", qvec, d) * inv[None]
            t = np.einsum("ntk,tk->nt", qvec, e2) * inv[None]
            hit = ok[None] & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1) & (t > 0)
            votes[s:s + chunk] += (hit.sum(axis=1) % 2).astype(np.int32)
    return np.where(votes >= 2, -1.0, 1.0).astype(np.float32)


def synthesize_reference_volume(dirname: str, uri: str) -> str:
    """Create the missing .sdf files for scenes 06/07 and cache them in the
    repo (the reference tests/ dir is read-only)."""
    from .ply import load_ply
    from .volume_io import save_sdf_volume

    cache_dir = os.path.join("/root/repo", ".cache", "sdfs")
    os.makedirs(cache_dir, exist_ok=True)
    base = os.path.basename(uri)
    out_path = os.path.join(cache_dir, base)
    if os.path.exists(out_path):
        return out_path

    name = base.replace(".sdf", "")
    mesh_path = None
    for root in ("/root/reference/tests/03_volume/shapes",
                 "/root/reference/tests/01_surface/shapes"):
        cand = os.path.join(root, f"{name}.ply")
        if os.path.exists(cand):
            mesh_path = cand
            break
    if mesh_path is None:
        # sackboy mesh is not in the repo either: substitute the bunny
        for root in ("/root/reference/tests/03_volume/shapes",):
            cand = os.path.join(root, "bunny.ply")
            if os.path.exists(cand):
                mesh_path = cand
                break
    if mesh_path is None:
        # last resort: analytic sphere grid
        dims = (64, 64, 64)
        w, h, d = dims
        res = 0.3 / 63
        xs = np.arange(w) * res
        Z, Y, X = np.meshgrid(np.arange(d) * res, np.arange(h) * res, xs,
                              indexing="ij")
        ctr = np.array([w, h, d], np.float32) * res / 2
        vals = np.sqrt((X - ctr[0]) ** 2 + (Y - ctr[1]) ** 2 + (Z - ctr[2]) ** 2) - 0.1
        save_sdf_volume(out_path, (w, h, d), vals.astype(np.float32), res)
        return out_path

    mesh = load_ply(mesh_path)
    tris = mesh["triangles"]
    if tris is None and mesh["quads"] is not None:
        from .obj import quads_to_triangles

        tris = quads_to_triangles(mesh["quads"])
    # shift mesh so its padded bbox corner sits at local origin (the grid box
    # spans [0, res*whd] in instance-local coordinates, yocto_sdfs.cpp:37-44)
    whd, values, res, lo = mesh_to_sdf(mesh["positions"], tris, dims=(96, 96, 96))
    save_sdf_volume(out_path, whd, values, res, origin=lo)
    return out_path
