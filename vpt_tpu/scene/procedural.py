"""Procedural stand-in shapes for assets the reference repo does not check in
(see BASELINE.md: sphere-displaced.obj, shape1.ply are referenced by scenes but
absent). UV-sphere quad meshes in the style of yocto's make_sphere."""

from __future__ import annotations

import numpy as np


def make_uvsphere(steps=(64, 32), scale=0.15, uvscale=(1.0, 1.0)):
    """Quad-mesh UV sphere with positions/normals/texcoords."""
    nu, nv = steps
    iu = np.arange(nu + 1)
    iv = np.arange(nv + 1)
    uu, vv = np.meshgrid(iu / nu, iv / nv, indexing="ij")
    phi = 2 * np.pi * uu
    theta = np.pi * vv
    pos = np.stack(
        [
            np.cos(phi) * np.sin(theta),
            np.sin(phi) * np.sin(theta),
            np.cos(theta),
        ],
        axis=-1,
    ).reshape(-1, 3)
    norm = pos.copy()
    tex = np.stack([uu * uvscale[0], vv * uvscale[1]], axis=-1).reshape(-1, 2)
    quads = []
    for i in range(nu):
        for j in range(nv):
            v00 = i * (nv + 1) + j
            v10 = (i + 1) * (nv + 1) + j
            quads.append([v00, v10, v10 + 1, v00 + 1])
    return {
        "positions": (pos * scale).astype(np.float32),
        "normals": norm.astype(np.float32),
        "texcoords": tex.astype(np.float32),
        "quads": np.asarray(quads, np.int32),
        "triangles": None,
        "colors": None,
        "radius": None,
    }


def make_sphere_shape(steps=32, scale=0.075, uvscale=1.0):
    return make_uvsphere((steps * 2, steps), scale, (uvscale, uvscale))


def make_sphere_fv(steps=32, scale=0.075):
    """Face-varying control cage version (for missing subdiv assets).

    Centered at (0, scale, 0) so it sits on the y=0 floor like the checked-in
    sphere.ply of tests/01_surface (those scenes place spheres with identity
    instance frames)."""
    s = make_sphere_shape(steps, scale)
    s["positions"] = s["positions"] + np.array([0, scale, 0], np.float32)
    return {
        "positions": s["positions"],
        "normals": s["normals"],
        "texcoords": s["texcoords"],
        "quadspos": s["quads"],
        "quadsnorm": s["quads"],
        "quadstexcoord": s["quads"],
    }
