"""Whole-scene import dispatch: JSON / OBJ(+MTL) / PLY / STL / glTF / PBRT.

Mirrors load_scene (/root/reference/libs/yocto/yocto_sceneio.cpp:2675-2706)
and the per-format converters (load_obj_scene :2641, load_ply_scene :2647,
load_stl_scene :2653, load_gltf_scene :2659, load_pbrt_scene :2667):
every format converts into the same HostScene model the JSON path builds,
then add_missing_camera/material fix up partial inputs.
"""

from __future__ import annotations

import os

import numpy as np

from . import image_io
from .schema import (
    Camera, Environment, HostScene, Instance, Material, Shape, Texture,
)


def load_scene(filename: str) -> HostScene:
    """Extension dispatch (yocto_sceneio.cpp:2675-2706)."""
    ext = os.path.splitext(filename)[1].lower()
    if ext == ".json":
        from .json_io import load_json_scene

        return load_json_scene(filename)
    if ext == ".obj":
        return load_obj_scene(filename)
    if ext in (".gltf", ".glb"):
        from .gltf import load_gltf_scene

        return load_gltf_scene(filename)
    if ext == ".pbrt":
        from .pbrt import load_pbrt_scene

        return load_pbrt_scene(filename)
    if ext == ".ply":
        return load_ply_scene(filename)
    if ext == ".stl":
        return load_stl_scene(filename)
    raise ValueError(f"{filename}: unknown scene format {ext!r}")


def save_scene(filename: str, scene: HostScene) -> None:
    """Extension dispatch, save side (yocto_sceneio.cpp:2697-2736)."""
    from .json_save import save_scene as _save

    _save(filename, scene)


def save_shape(filename: str, shape) -> None:
    """save_shape parity (yocto_sceneio.cpp:1028): PLY / OBJ / STL."""
    from .json_save import save_shape as _save

    _save(filename, shape)


# ---------------------------------------------------------------------------
# fixups (yocto_scene.cpp:661-680 add_camera; sceneio add_missing_*)
# ---------------------------------------------------------------------------

def _lookat_frame(eye, center, up):
    z = eye - center
    z = z / max(np.linalg.norm(z), 1e-30)
    x = np.cross(up, z)
    x = x / max(np.linalg.norm(x), 1e-30)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye]).astype(np.float32)


def _scene_bounds(scene: HostScene):
    lo = np.full(3, np.inf, np.float32)
    hi = np.full(3, -np.inf, np.float32)
    from ..core.vecmath import np_transform_point

    for inst in scene.instances:
        shape = scene.shapes[inst.shape]
        if shape.positions is None or not len(shape.positions):
            continue
        wp = np_transform_point(inst.frame, shape.positions)
        lo = np.minimum(lo, wp.min(axis=0))
        hi = np.maximum(hi, wp.max(axis=0))
    if not np.isfinite(lo).all():
        lo, hi = -np.ones(3, np.float32), np.ones(3, np.float32)
    return lo, hi


def add_missing_camera(scene: HostScene):
    """yocto add_camera (yocto_scene.cpp:661-680): frame the scene bounds."""
    if scene.cameras:
        return scene
    lens, film, aspect = 0.050, 0.036, 16.0 / 9.0
    lo, hi = _scene_bounds(scene)
    center = (lo + hi) / 2
    radius = float(np.linalg.norm(hi - lo)) / 2
    dist = 2.0 * radius * lens / (film / aspect)
    eye = center + np.array([0, 0, 1], np.float32) * dist
    scene.cameras.append(Camera(
        frame=_lookat_frame(eye, center, np.array([0, 1, 0], np.float32)),
        lens=lens, film=film, aspect=aspect,
        focus=float(np.linalg.norm(eye - center))))
    return scene


def add_missing_material(scene: HostScene):
    if not scene.materials:
        scene.materials.append(Material(
            type=0, color=np.array([0.8, 0.8, 0.8], np.float32)))
    for inst in scene.instances:
        if inst.material < 0:
            inst.material = 0
    return scene


def _identity_frame():
    return np.asarray(
        [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0], np.float32).reshape(4, 3)


# ---------------------------------------------------------------------------
# PLY / STL shape scenes (yocto_sceneio.cpp:2647-2657: one mesh + fixups)
# ---------------------------------------------------------------------------

def _shape_scene(shape: Shape) -> HostScene:
    scene = HostScene()
    scene.shapes.append(shape)
    scene.instances.append(Instance(
        frame=_identity_frame(), shape=0, material=-1))
    add_missing_material(scene)
    add_missing_camera(scene)
    return scene


def load_ply_scene(filename: str) -> HostScene:
    from .ply import load_ply

    d = load_ply(filename)
    return _shape_scene(Shape(
        positions=d.get("positions"), normals=d.get("normals"),
        texcoords=d.get("texcoords"), colors=d.get("colors"),
        radius=d.get("radius"), triangles=d.get("triangles"),
        quads=d.get("quads")))


def load_stl_scene(filename: str) -> HostScene:
    from .stl import load_stl

    d = load_stl(filename)
    return _shape_scene(Shape(
        positions=d.get("positions"), triangles=d.get("triangles")))


# ---------------------------------------------------------------------------
# OBJ scene (yocto_sceneio.cpp load_obj_scene): MTL materials, shapes split
# per object/material, converted with yocto's material heuristics
# ---------------------------------------------------------------------------

def _exponent_to_roughness(exponent: float) -> float:
    """yocto's Phong-exponent conversion (load_obj_scene)."""
    if exponent >= 1000:
        return 0.0
    r = (2.0 / (exponent + 2.0)) ** 0.25
    if r < 0.01:
        return 0.0
    if r > 0.99:
        return 1.0
    return r


def _parse_mtl(path: str, textures: list, tex_index: dict):
    """Parse a .mtl file into Material list entries + texture registry."""
    mats, names = [], []
    cur = None

    def texref(tokens):
        # last token is the path (options ignored)
        p = tokens[-1]
        if p not in tex_index:
            tex_index[p] = len(textures)
            textures.append(p)
        return tex_index[p]

    raw = []
    with open(path, "r", errors="replace") as f:
        for line in f:
            t = line.split("#")[0].split()
            if not t:
                continue
            key = t[0].lower()
            if key == "newmtl":
                cur = {"name": t[1] if len(t) > 1 else f"mat{len(raw)}",
                       "diffuse": (0.8, 0.8, 0.8)}
                raw.append(cur)
            elif cur is None:
                continue
            elif key == "kd":
                cur["diffuse"] = tuple(float(x) for x in t[1:4])
            elif key == "ks":
                cur["specular"] = tuple(float(x) for x in t[1:4])
            elif key == "ke":
                cur["emission"] = tuple(float(x) for x in t[1:4])
            elif key in ("kt", "tf"):
                cur["transmission"] = tuple(float(x) for x in t[1:4])
            elif key == "ns":
                cur["exponent"] = float(t[1])
            elif key == "ni":
                cur["ior"] = float(t[1])
            elif key == "d":
                cur["opacity"] = float(t[1])
            elif key == "tr":
                cur["opacity"] = 1.0 - float(t[1])
            elif key == "map_kd":
                cur["diffuse_tex"] = texref(t)
            elif key == "map_ks":
                cur["specular_tex"] = texref(t)
            elif key == "map_ke":
                cur["emission_tex"] = texref(t)
            elif key in ("map_kt", "map_tf"):
                cur["transmission_tex"] = texref(t)
            elif key in ("map_bump", "bump", "norm", "map_norm"):
                cur["normal_tex"] = texref(t)

    for m in raw:
        # yocto conversion heuristics (load_obj_scene)
        mat = Material(type=7)  # gltfpbr default
        mat.emission = np.asarray(m.get("emission", (0, 0, 0)), np.float32)
        mat.emission_tex = m.get("emission_tex", -1)
        trans = m.get("transmission", (0, 0, 0))
        spec = m.get("specular", (0, 0, 0))
        if max(trans) > 0.1:
            mat.type = 3  # transparent
            mat.color = np.asarray(trans, np.float32)
            mat.color_tex = m.get("transmission_tex", -1)
        elif max(spec) > 0.2:
            mat.type = 2  # reflective
            mat.color = np.asarray(spec, np.float32)
            mat.color_tex = m.get("specular_tex", -1)
        elif max(spec) > 0:
            mat.type = 1  # glossy
            mat.color = np.asarray(m["diffuse"], np.float32)
            mat.color_tex = m.get("diffuse_tex", -1)
        else:
            mat.type = 0  # matte
            mat.color = np.asarray(m["diffuse"], np.float32)
            mat.color_tex = m.get("diffuse_tex", -1)
        mat.roughness = _exponent_to_roughness(m.get("exponent", 1e6))
        mat.ior = m.get("ior", 1.5)
        mat.metallic = 0.0
        mat.opacity = m.get("opacity", 1.0)
        mat.normal_tex = m.get("normal_tex", -1)
        mats.append(mat)
        names.append(m["name"])
    return mats, names


def load_obj_scene(filename: str) -> HostScene:
    """OBJ + MTL to HostScene: shapes split at o/g/usemtl boundaries, one
    material per shape (instance.material = first element's material, like
    yocto), lines/points preserved."""
    scene = HostScene()
    dirname = os.path.dirname(filename)
    texture_paths: list[str] = []
    tex_index: dict[str, int] = {}
    mat_names: dict[str, int] = {}

    positions, texcoords, normals = [], [], []
    groups = []  # each: dict(mat, faces[], lines[], points[])
    cur = {"mat": -1, "faces": [], "lines": [], "points": []}

    def flush():
        nonlocal cur
        if cur["faces"] or cur["lines"] or cur["points"]:
            groups.append(cur)
        cur = {"mat": cur["mat"], "faces": [], "lines": [], "points": []}

    def vid(tok, n):
        i = int(tok)
        return i - 1 if i > 0 else n + i

    with open(filename, "r", errors="replace") as f:
        for line in f:
            t = line.split("#")[0].split()
            if not t:
                continue
            key = t[0]
            if key == "v":
                positions.append([float(x) for x in t[1:4]])
            elif key == "vt":
                texcoords.append([float(t[1]), 1.0 - float(t[2])])
            elif key == "vn":
                normals.append([float(x) for x in t[1:4]])
            elif key == "mtllib":
                p = os.path.join(dirname, t[1])
                if os.path.exists(p):
                    mats, names = _parse_mtl(p, texture_paths, tex_index)
                    for nm, mm in zip(names, mats):
                        mat_names[nm] = len(scene.materials)
                        scene.materials.append(mm)
            elif key == "usemtl":
                flush()
                cur["mat"] = mat_names.get(t[1], -1)
            elif key in ("o", "g"):
                flush()
            elif key == "f":
                verts = []
                for tok in t[1:]:
                    parts = tok.split("/")
                    vi = vid(parts[0], len(positions))
                    ti = (vid(parts[1], len(texcoords))
                          if len(parts) > 1 and parts[1] else -1)
                    ni = (vid(parts[2], len(normals))
                          if len(parts) > 2 and parts[2] else -1)
                    verts.append((vi, ti, ni))
                cur["faces"].append(verts)
            elif key == "l":
                ids = [vid(tok.split("/")[0], len(positions)) for tok in t[1:]]
                for i in range(len(ids) - 1):
                    cur["lines"].append((ids[i], ids[i + 1]))
            elif key == "p":
                for tok in t[1:]:
                    cur["points"].append(vid(tok.split("/")[0], len(positions)))
    flush()

    positions = np.asarray(positions, np.float32).reshape(-1, 3)
    texcoords = (np.asarray(texcoords, np.float32).reshape(-1, 2)
                 if texcoords else None)
    normals = (np.asarray(normals, np.float32).reshape(-1, 3)
               if normals else None)

    for g in groups:
        # split face-varying (v, vt, vn) tuples into shared vertices
        keyset = {}
        def share(k):
            if k not in keyset:
                keyset[k] = len(keyset)
            return keyset[k]

        tris, quads = [], []
        for verts in g["faces"]:
            ids = [share(k) for k in verts]
            if len(ids) == 4:
                quads.append(ids)
            else:
                for i in range(1, len(ids) - 1):
                    tris.append([ids[0], ids[i], ids[i + 1]])
        lines = [(share((a, -1, -1)), share((b, -1, -1)))
                 for a, b in g["lines"]]
        points = [share((a, -1, -1)) for a in g["points"]]
        keys = sorted(keyset, key=keyset.get)
        vpos = positions[[k[0] for k in keys]]
        vtex = (texcoords[[k[1] for k in keys]]
                if texcoords is not None and all(k[1] >= 0 for k in keys)
                else None)
        vnorm = (normals[[k[2] for k in keys]]
                 if normals is not None and all(k[2] >= 0 for k in keys)
                 else None)
        shape = Shape(
            positions=vpos, normals=vnorm, texcoords=vtex,
            triangles=np.asarray(tris, np.int32) if tris else None,
            quads=np.asarray(quads, np.int32) if quads else None,
            lines=np.asarray(lines, np.int32) if lines else None,
            points=np.asarray(points, np.int32) if points else None,
            radius=(np.full(len(keys), 1e-3, np.float32)
                    if (lines or points) else None))
        scene.instances.append(Instance(
            frame=_identity_frame(), shape=len(scene.shapes),
            material=g["mat"]))
        scene.shapes.append(shape)

    for p in texture_paths:
        full = os.path.join(dirname, p)
        tex = Texture()
        try:
            pixels, linear = image_io.load_image(full)
            tex.width, tex.height = pixels.shape[1], pixels.shape[0]
            tex.pixels, tex.linear = pixels, linear
        except (FileNotFoundError, ValueError):
            tex.width = tex.height = 8
            tex.pixels = np.full((8, 8, 4), 0.5, np.float32)
            tex.pixels[..., 3] = 1.0
            tex.linear = False
        scene.textures.append(tex)

    add_missing_material(scene)
    add_missing_camera(scene)
    return scene
