"""Wavefront OBJ loader with face-varying support.

The reference loads subdivision control cages as face-varying quads from OBJ
(load_fvshape, /root/reference/libs/yocto/yocto_sceneio.cpp:2829-2840, parser
in yocto_modelio.cpp:307+). We mirror that: faces keep separate
position/texcoord/normal index tuples (quadspos/quadstexcoord/quadsnorm);
non-face-varying loads collapse to unique vertex tuples.
"""

from __future__ import annotations

import numpy as np


def _parse_index(tok: str, nv: int, nt: int, nn: int):
    parts = tok.split("/")
    vi = int(parts[0])
    vi = vi - 1 if vi > 0 else nv + vi
    ti = ni = -1
    if len(parts) > 1 and parts[1]:
        ti = int(parts[1])
        ti = ti - 1 if ti > 0 else nt + ti
    if len(parts) > 2 and parts[2]:
        ni = int(parts[2])
        ni = ni - 1 if ni > 0 else nn + ni
    return vi, ti, ni


def load_obj_fv(path: str):
    """Load an OBJ as a face-varying quad mesh.

    Returns dict: positions (V,3), texcoords (T,2) | None, normals (N,3) | None,
    quadspos (F,4) i32, quadstexcoord (F,4) | None, quadsnorm (F,4) | None.
    Triangles are stored as degenerate quads (z == w), matching yocto.
    """
    positions, texcoords, normals = [], [], []
    fpos, ftex, fnorm = [], [], []
    lines_, points_ = [], []
    has_tex = has_norm = False
    with open(path, "r", errors="replace") as f:
        for line in f:
            if line.startswith("v "):
                positions.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("vt "):
                vals = [float(x) for x in line.split()[1:3]]
                # flip v like yocto (OBJ uses bottom-left origin)
                texcoords.append([vals[0], 1.0 - vals[1]])
            elif line.startswith("vn "):
                normals.append([float(x) for x in line.split()[1:4]])
            elif line.startswith("f "):
                toks = line.split()[1:]
                idx = [
                    _parse_index(t, len(positions), len(texcoords), len(normals))
                    for t in toks
                ]
                # fan into quads: yocto packs n-gons as quads with repeats;
                # 3 -> (a,b,c,c); 4 -> (a,b,c,d); n>4 -> triangle fan
                def emit(quad):
                    fpos.append([q[0] for q in quad])
                    ftex.append([q[1] for q in quad])
                    fnorm.append([q[2] for q in quad])

                if len(idx) == 3:
                    emit([idx[0], idx[1], idx[2], idx[2]])
                elif len(idx) == 4:
                    emit(idx)
                else:
                    for i in range(1, len(idx) - 1):
                        emit([idx[0], idx[i], idx[i + 1], idx[i + 1]])
                if idx and idx[0][1] >= 0:
                    has_tex = True
                if idx and idx[0][2] >= 0:
                    has_norm = True
            elif line.startswith("l "):
                vids = [
                    _parse_index(t, len(positions), len(texcoords),
                                 len(normals))[0]
                    for t in line.split()[1:]
                ]
                for i in range(len(vids) - 1):
                    lines_.append([vids[i], vids[i + 1]])
            elif line.startswith("p "):
                for t in line.split()[1:]:
                    points_.append(_parse_index(
                        t, len(positions), len(texcoords), len(normals))[0])
    out = {
        "positions": np.asarray(positions, np.float32),
        "texcoords": np.asarray(texcoords, np.float32) if texcoords else None,
        "normals": np.asarray(normals, np.float32) if normals else None,
        "quadspos": np.asarray(fpos, np.int32).reshape(-1, 4),
        "quadstexcoord": (np.asarray(ftex, np.int32).reshape(-1, 4)
                          if has_tex else None),
        "quadsnorm": (np.asarray(fnorm, np.int32).reshape(-1, 4)
                      if has_norm else None),
        "lines": np.asarray(lines_, np.int32).reshape(-1, 2) if lines_ else None,
        "points": np.asarray(points_, np.int32) if points_ else None,
    }
    return out


def split_facevarying(quadspos, quadsnorm, quadstexcoord, positions, normals, texcoords):
    """Convert face-varying quads to a single-index quad mesh
    (yocto_shape.h:604 split_facevarying): unique (pos, norm, tex) tuples
    become shared vertices."""
    f = quadspos.reshape(-1)
    n = quadsnorm.reshape(-1) if quadsnorm is not None else np.full_like(f, -1)
    t = quadstexcoord.reshape(-1) if quadstexcoord is not None else np.full_like(f, -1)
    keys = np.stack([f, n, t], axis=-1)
    uniq, inverse = np.unique(keys, axis=0, return_inverse=True)
    quads = inverse.reshape(quadspos.shape).astype(np.int32)
    new_pos = positions[uniq[:, 0]]
    new_norm = normals[uniq[:, 1]] if (normals is not None and (uniq[:, 1] >= 0).all()) else None
    new_tex = (
        texcoords[uniq[:, 2]] if (texcoords is not None and (uniq[:, 2] >= 0).all()) else None
    )
    return quads, new_pos, new_norm, new_tex


def load_obj_shape(path: str):
    """Load an OBJ as a plain (non-face-varying) shape with quads; OBJ
    'l'/'p' statements load as line/point primitives (position-indexed,
    like yocto's obj shape loader)."""
    fv = load_obj_fv(path)
    if fv["quadspos"].shape[0] == 0 and (
            fv.get("lines") is not None or fv.get("points") is not None):
        return {
            "positions": fv["positions"], "normals": fv["normals"],
            "texcoords": fv["texcoords"], "quads": None, "triangles": None,
            "colors": None, "radius": None,
            "lines": fv.get("lines"), "points": fv.get("points"),
        }
    quads, pos, norm, tex = split_facevarying(
        fv["quadspos"], fv["quadsnorm"], fv["quadstexcoord"],
        fv["positions"], fv["normals"], fv["texcoords"],
    )
    # line/point indices reference original positions; remap them onto the
    # split vertex table (first split vertex of each original position,
    # recomputing the same unique keys split_facevarying uses)
    lines, points = fv.get("lines"), fv.get("points")
    if lines is not None or points is not None:
        f = fv["quadspos"].reshape(-1)
        n = (fv["quadsnorm"].reshape(-1) if fv["quadsnorm"] is not None
             else np.full_like(f, -1))
        t = (fv["quadstexcoord"].reshape(-1) if fv["quadstexcoord"] is not None
             else np.full_like(f, -1))
        uniq = np.unique(np.stack([f, n, t], axis=-1), axis=0)
        posmap = np.full(fv["positions"].shape[0], -1, np.int64)
        vals, first = np.unique(uniq[:, 0], return_index=True)
        posmap[vals] = first
        if lines is not None:
            lines = posmap[lines].astype(np.int32)
        if points is not None:
            points = posmap[points].astype(np.int32)
    return {
        "positions": pos, "normals": norm, "texcoords": tex,
        "quads": quads, "triangles": None, "colors": None, "radius": None,
        "lines": lines, "points": points,
    }


def save_obj_shape(path: str, shape: dict):
    """Write a shape dict as Wavefront OBJ (reference save_shape OBJ branch,
    yocto_sceneio.cpp:1048-1062): v/vn/vt records then f/l/p records with
    1-based shared indices (same index for pos/uv/normal)."""
    pos = np.asarray(shape["positions"], np.float32)
    has_n = shape.get("normals") is not None
    has_t = shape.get("texcoords") is not None
    out = []
    for p in pos:
        out.append(f"v {p[0]:.8g} {p[1]:.8g} {p[2]:.8g}")
    if has_t:
        for t in np.asarray(shape["texcoords"], np.float32):
            out.append(f"vt {t[0]:.8g} {t[1]:.8g}")
    if has_n:
        for n in np.asarray(shape["normals"], np.float32):
            out.append(f"vn {n[0]:.8g} {n[1]:.8g} {n[2]:.8g}")

    def vref(i):
        i = int(i) + 1
        if has_t and has_n:
            return f"{i}/{i}/{i}"
        if has_t:
            return f"{i}/{i}"
        if has_n:
            return f"{i}//{i}"
        return str(i)

    for key, rec in (("triangles", "f"), ("quads", "f"), ("lines", "l"),
                     ("points", "p")):
        idx = shape.get(key)
        if idx is None or len(idx) == 0:
            continue
        idx = np.asarray(idx, np.int64).reshape(len(idx), -1)
        for row in idx:
            out.append(rec + " " + " ".join(vref(i) for i in row))
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def quads_to_triangles(quads: np.ndarray) -> np.ndarray:
    """yocto quads_to_triangles (yocto_shape.h:596): (x,y,w) + (z,w,y); skip the
    second for degenerate quads (z == w)."""
    t1 = quads[:, [0, 1, 3]]
    t2 = quads[:, [2, 3, 1]]
    keep2 = quads[:, 2] != quads[:, 3]
    return np.concatenate([t1, t2[keep2]], axis=0).astype(np.int32)
