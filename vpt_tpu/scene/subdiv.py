"""Catmull-Clark subdivision, face-varying split, and displacement.

Vectorized numpy re-derivation of the author's tesselation pipeline
(tesselate_catmullclark / tesselate_surface,
/root/reference/libs/yocto_pathtrace/yocto_pathtrace.cpp:1119-1280):
one level per call over quads (triangles as degenerate q.z == q.w), edge/face
point insertion, boundary handling with lock_boundary, averaging pass and the
4/valence correction pass. Runs once at scene load, so it lives host-side in
numpy (SURVEY.md §7.6).
"""

from __future__ import annotations

import numpy as np


def _build_edges(quads: np.ndarray):
    """Unique undirected edges of a quad mesh + per-quad edge indices.

    Returns (edges (E,2), boundary_mask (E,), quad_edge (F,4) indices), where
    quad_edge[f, k] is the edge index of edge (q[k], q[k+1 mod 4 or 3]).
    Triangles (q.z == q.w) contribute 3 edges: (x,y), (y,z), (z,x).
    """
    tri = quads[:, 2] == quads[:, 3]
    e0 = quads[:, [0, 1]]
    e1 = quads[:, [1, 2]]
    e2 = np.where(tri[:, None], quads[:, [2, 0]], quads[:, [2, 3]])
    e3 = np.where(tri[:, None], -1, quads[:, [3, 0]])
    all_edges = np.concatenate([e0, e1, e2, e3], axis=0)  # (4F, 2)
    valid = all_edges[:, 0] >= 0
    keys = np.sort(all_edges, axis=1)
    keys[~valid] = -1
    uniq, inverse, counts = np.unique(
        keys, axis=0, return_inverse=True, return_counts=True
    )
    # drop the invalid (-1,-1) row if present
    offset = 0
    if uniq.shape[0] > 0 and uniq[0, 0] < 0:
        offset = 1
    edges = uniq[offset:]
    boundary = counts[offset:] == 1
    F = quads.shape[0]
    quad_edge = (inverse.reshape(4, F).T - offset).astype(np.int64)
    quad_edge[~valid.reshape(4, F).T] = -1
    # preserve first-seen orientation like yocto's edge_map (unused for CC but
    # kept for boundary queries)
    return edges.astype(np.int64), boundary, quad_edge


def subdivide_catmullclark(quads: np.ndarray, vert: np.ndarray, lock_boundary: bool):
    """One Catmull-Clark level; mirrors tesselate_catmullclark semantics
    (yocto_pathtrace.cpp:1119-1228). vert may be (V,3) positions or (V,2)
    texcoords. Returns (new_quads, new_vert)."""
    quads = np.asarray(quads, np.int64)
    vert = np.asarray(vert, np.float64)
    edges, boundary_mask, quad_edge = _build_edges(quads)
    nv = vert.shape[0]
    ne = edges.shape[0]
    nf = quads.shape[0]
    tri = quads[:, 2] == quads[:, 3]

    # --- vertices: originals, edge midpoints, face centroids ---
    edge_verts = vert[edges].mean(axis=1)
    face_sum = vert[quads[:, 0]] + vert[quads[:, 1]] + vert[quads[:, 2]]
    face_verts = np.where(
        tri[:, None], face_sum / 3.0, (face_sum + vert[quads[:, 3]]) / 4.0
    )
    tverts = np.concatenate([vert, edge_verts, face_verts], axis=0)

    # --- faces: one quad per original corner ---
    fid = nv + ne + np.arange(nf)
    e01 = nv + quad_edge[:, 0]
    e12 = nv + quad_edge[:, 1]
    e23 = nv + quad_edge[:, 2]  # (z,x) for tris, (z,w) for quads
    e30 = nv + quad_edge[:, 3]  # (w,x) for quads, invalid for tris
    q = quads
    tq = []
    # quad faces
    quad_rows = ~tri
    tq.append(np.stack([q[quad_rows, 0], e01[quad_rows], fid[quad_rows], e30[quad_rows]], 1))
    tq.append(np.stack([q[quad_rows, 1], e12[quad_rows], fid[quad_rows], e01[quad_rows]], 1))
    tq.append(np.stack([q[quad_rows, 2], e23[quad_rows], fid[quad_rows], e12[quad_rows]], 1))
    tq.append(np.stack([q[quad_rows, 3], e30[quad_rows], fid[quad_rows], e23[quad_rows]], 1))
    # triangle faces
    tr = tri
    tq.append(np.stack([q[tr, 0], e01[tr], fid[tr], e23[tr]], 1))
    tq.append(np.stack([q[tr, 1], e12[tr], fid[tr], e01[tr]], 1))
    tq.append(np.stack([q[tr, 2], e23[tr], fid[tr], e12[tr]], 1))
    tquads = np.concatenate(tq, axis=0)

    # --- subdivided boundary edges ---
    bedges = edges[boundary_mask]
    bedge_ids = nv + np.nonzero(boundary_mask)[0]
    tboundary = np.concatenate(
        [
            np.stack([bedges[:, 0], bedge_ids], 1),
            np.stack([bedge_ids, bedges[:, 1]], 1),
        ],
        axis=0,
    )

    # vertex "valence class": 2 = interior, 1/0 = boundary (crease edge/corner)
    tverts_val = np.full(tverts.shape[0], 2, np.int8)
    bnd_verts = np.unique(tboundary)
    tverts_val[bnd_verts] = 0 if lock_boundary else 1

    avert = np.zeros_like(tverts)
    acount = np.zeros(tverts.shape[0], np.int64)

    if not lock_boundary:
        # crease edges: midpoints accumulate into their val-1 endpoints; the
        # reference's locked path (val 0) reduces to "keep original position"
        mid = tverts[tboundary].mean(axis=1)
        for col in (0, 1):
            ids = tboundary[:, col]
            sel = tverts_val[ids] == 1
            np.add.at(avert, ids[sel], mid[sel])
            np.add.at(acount, ids[sel], 1)

    # interior: face centroids accumulate into val-2 corners
    centroids = tverts[tquads].mean(axis=1)
    for col in range(4):
        ids = tquads[:, col]
        sel = tverts_val[ids] == 2
        np.add.at(avert, ids[sel], centroids[sel])
        np.add.at(acount, ids[sel], 1)

    safe = np.maximum(acount, 1)[:, None]
    avert = avert / safe
    # correction pass: v + (avg - v) * (4 / valence) for interior verts only
    interior = tverts_val == 2
    corrected = tverts + (avert - tverts) * (4.0 / safe)
    out = np.where(interior[:, None], corrected, avert)
    # locked boundary (val 0) and untouched verts keep their position
    untouched = (acount == 0) | (tverts_val == 0)
    out[untouched] = tverts[untouched]
    return tquads.astype(np.int32), out.astype(np.float32)


def quads_normals(quads: np.ndarray, positions: np.ndarray) -> np.ndarray:
    """Area-weighted vertex normals over quads (yocto_shape.h:314)."""
    q = np.asarray(quads, np.int64)
    p = np.asarray(positions, np.float64)
    tri = q[:, 2] == q[:, 3]
    # yocto quad_normal = normalize(cross of diagonals averaged); use the sum of
    # the two triangle cross products (unnormalized => area weighting)
    n1 = np.cross(p[q[:, 1]] - p[q[:, 0]], p[q[:, 3]] - p[q[:, 0]])
    n2 = np.cross(p[q[:, 3]] - p[q[:, 2]], p[q[:, 1]] - p[q[:, 2]])
    n2[tri] = 0.0
    fn = n1 + n2
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-30)
    out = np.zeros_like(p)
    for col in range(4):
        sel = np.ones(q.shape[0], bool) if col < 3 else ~tri
        np.add.at(out, q[sel, col], fn[sel])
    out /= np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-30)
    return out.astype(np.float32)


def triangles_normals(triangles: np.ndarray, positions: np.ndarray) -> np.ndarray:
    t = np.asarray(triangles, np.int64)
    p = np.asarray(positions, np.float64)
    fn = np.cross(p[t[:, 1]] - p[t[:, 0]], p[t[:, 2]] - p[t[:, 0]])
    fn /= np.maximum(np.linalg.norm(fn, axis=-1, keepdims=True), 1e-30)
    out = np.zeros_like(p)
    for col in range(3):
        np.add.at(out, t[:, col], fn)
    out /= np.maximum(np.linalg.norm(out, axis=-1, keepdims=True), 1e-30)
    return out.astype(np.float32)


def tesselate_surface(subdiv, scene):
    """Full author pipeline (yocto_pathtrace.cpp:1230-1273): subdivide
    positions (unlocked) and texcoords (locked), optional smooth normals,
    face-varying split, quads->triangles, optional displacement.

    Returns a Shape-dict: positions/normals/texcoords/triangles.
    """
    from .obj import quads_to_triangles, split_facevarying

    quadspos = subdiv.quadspos
    positions = subdiv.positions
    quadstexcoord = subdiv.quadstexcoord
    texcoords = subdiv.texcoords
    normals = None
    quadsnorm = subdiv.quadsnorm

    if subdiv.subdivisions != 0:
        for _ in range(subdiv.subdivisions):
            quadspos, positions = subdivide_catmullclark(quadspos, positions, False)
        if quadstexcoord is not None and texcoords is not None:
            for _ in range(subdiv.subdivisions):
                quadstexcoord, texcoords = subdivide_catmullclark(
                    quadstexcoord, texcoords, True
                )
        if subdiv.smooth:
            normals = quads_normals(quadspos, positions)
            quadsnorm = quadspos
        else:
            normals = None
            quadsnorm = None
    else:
        normals = subdiv.normals

    quads, pos, norm, tex = split_facevarying(
        quadspos, quadsnorm, quadstexcoord, positions, normals, texcoords
    )
    triangles = quads_to_triangles(quads)

    if (
        subdiv.displacement != 0
        and subdiv.displacement_tex >= 0
        and triangles.shape[0] > 0
    ):
        if norm is None:
            norm = triangles_normals(triangles, pos)
        tex_data = scene.textures[subdiv.displacement_tex]
        from .texture_host import eval_texture_host

        disp_rgba = eval_texture_host(tex_data, tex, as_linear=True)
        disp = disp_rgba[:, :3].mean(axis=-1)
        if not tex_data.linear:
            # byte textures offset by -0.5 (yocto_pathtrace.cpp:1264)
            disp = disp - 0.5
        pos = pos + norm * (subdiv.displacement * disp)[:, None]
        if subdiv.smooth:
            norm = triangles_normals(triangles, pos)
        else:
            norm = None

    return {
        "positions": pos.astype(np.float32),
        "normals": None if norm is None else norm.astype(np.float32),
        "texcoords": None if tex is None else tex.astype(np.float32),
        "colors": None,
        "radius": None,
        "triangles": triangles,
        "quads": None,
    }


def tesselate_surfaces(scene):
    """In-place tesselation of all subdivs (yocto_pathtrace.cpp:1275-1280)."""
    from .schema import Shape

    for sd in scene.subdivs:
        result = tesselate_surface(sd, scene)
        shape = scene.shapes[sd.shape]
        for k, v in result.items():
            setattr(shape, k, v)
    return scene
