"""PBRT scene import (subset).

Mirrors load_pbrt_scene (/root/reference/libs/yocto/yocto_sceneio.cpp:2667,
parser in yocto_modelio.cpp:516) which itself handles only an adapted
subset: LookAt/Camera/Film, transform stack, a material-name mapping onto
the renderer's lobes, area lights, infinite lights, and trianglemesh /
plymesh / sphere shapes. Both pbrt-v3 and the common v4 material names are
accepted.
"""

from __future__ import annotations

import os
import re

import numpy as np

from .schema import (
    Camera, Environment, HostScene, Instance, Material, Shape, Texture,
)

_TOKEN = re.compile(r'"[^"]*"|\[|\]|[^\s"\[\]]+')


def _tokenize(text: str):
    for line in text.splitlines():
        line = line.split("#", 1)[0]
        for m in _TOKEN.finditer(line):
            yield m.group(0)


def _is_num(tok: str) -> bool:
    try:
        float(tok)
        return True
    except ValueError:
        return False


class _Parser:
    def __init__(self, tokens):
        self.toks = list(tokens)
        self.i = 0

    def peek(self):
        return self.toks[self.i] if self.i < len(self.toks) else None

    def next(self):
        t = self.peek()
        self.i += 1
        return t

    def values(self):
        """One value or a [ ... ] list following a parameter name."""
        t = self.next()
        if t == "[":
            out = []
            while True:
                t = self.next()
                if t is None or t == "]":
                    break
                out.append(t.strip('"') if t.startswith('"') else float(t))
            return out
        if t.startswith('"'):
            return [t.strip('"')]
        return [float(t)]

    def params(self):
        """Parse trailing '"type name" value' parameter declarations."""
        out = {}
        while True:
            t = self.peek()
            if t is None or not (t.startswith('"') and " " in t.strip('"')):
                break
            decl = self.next().strip('"')
            name = decl.split()[-1]
            out[name] = self.values()
        return out


def _translate(x, y, z):
    m = np.eye(4, dtype=np.float32)
    m[:3, 3] = (x, y, z)
    return m


def _scale(x, y, z):
    return np.diag([x, y, z, 1.0]).astype(np.float32)


def _rotate(angle_deg, x, y, z):
    a = np.radians(angle_deg)
    v = np.asarray([x, y, z], np.float32)
    v = v / max(np.linalg.norm(v), 1e-30)
    c, s = np.cos(a), np.sin(a)
    C = 1 - c
    R = np.array([
        [c + v[0] * v[0] * C, v[0] * v[1] * C - v[2] * s, v[0] * v[2] * C + v[1] * s],
        [v[1] * v[0] * C + v[2] * s, c + v[1] * v[1] * C, v[1] * v[2] * C - v[0] * s],
        [v[2] * v[0] * C - v[1] * s, v[2] * v[1] * C + v[0] * s, c + v[2] * v[2] * C],
    ], np.float32)
    m = np.eye(4, dtype=np.float32)
    m[:3, :3] = R
    return m


def _mat_to_frame(m):
    return np.stack(
        [m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3]]).astype(np.float32)


def _lookat_frame(eye, center, up):
    z = eye - center
    z = z / max(np.linalg.norm(z), 1e-30)
    x = np.cross(up, z)
    x = x / max(np.linalg.norm(x), 1e-30)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye]).astype(np.float32)


def _rgb(params, *names, default=(0.5, 0.5, 0.5)):
    for n in names:
        if n in params:
            v = params[n]
            if len(v) >= 3 and not isinstance(v[0], str):
                return np.asarray(v[:3], np.float32)
            if len(v) == 1 and not isinstance(v[0], str):
                return np.full(3, float(v[0]), np.float32)
    return np.asarray(default, np.float32)


def _f(params, *names, default=0.0):
    for n in names:
        if n in params and not isinstance(params[n][0], str):
            return float(params[n][0])
    return float(default)


def _convert_material(mtype: str, params: dict, named_tex: dict,
                      textures: list) -> Material:
    """yocto's pbrt material mapping, covering v3 and v4 names."""
    mat = Material(type=0, color=np.asarray([0.5, 0.5, 0.5], np.float32))

    def colortex(*names, default=(0.5, 0.5, 0.5)):
        for n in names:
            if n in params and isinstance(params[n][0], str):
                tex = named_tex.get(params[n][0], -1)
                return np.ones(3, np.float32), tex
        return _rgb(params, *names, default=default), -1

    rough = _f(params, "roughness", "uroughness", default=0.01)
    if mtype in ("matte", "diffuse"):
        mat.type = 0
        mat.color, mat.color_tex = colortex("Kd", "reflectance")
    elif mtype in ("plastic", "uber", "substrate", "coateddiffuse"):
        mat.type = 1  # glossy
        mat.color, mat.color_tex = colortex("Kd", "reflectance")
        mat.roughness = max(rough, 0.01) ** 0.5
    elif mtype in ("metal", "conductor"):
        mat.type = 2  # reflective
        mat.color, mat.color_tex = colortex(
            "Ks", "reflectance", default=(0.9, 0.9, 0.9))
        mat.roughness = rough ** 0.5
    elif mtype == "mirror":
        mat.type = 2
        mat.color, mat.color_tex = colortex("Kr", default=(0.9, 0.9, 0.9))
        mat.roughness = 0.0
    elif mtype in ("glass", "dielectric"):
        mat.type = 4  # refractive
        mat.color = np.ones(3, np.float32)
        mat.roughness = 0.0
        mat.ior = _f(params, "eta", "index", default=1.5)
    elif mtype in ("translucent", "diffusetransmission"):
        mat.type = 5  # subsurface-style
        mat.color, mat.color_tex = colortex("Kd", "reflectance")
    else:
        mat.type = 0
        mat.color, mat.color_tex = colortex("Kd", "reflectance")
    return mat


def load_pbrt_scene(filename: str) -> HostScene:
    dirname = os.path.dirname(filename)
    with open(filename, "r", errors="replace") as f:
        p = _Parser(_tokenize(f.read()))

    scene = HostScene()
    film_aspect = None
    camera_decl = None      # (type, params, world-to-camera ctm)
    ctm = np.eye(4, dtype=np.float32)
    cur_mat = -1
    cur_emission = None
    stack = []
    named_materials: dict[str, int] = {}
    named_tex: dict[str, int] = {}
    default_mat: int | None = None

    def ensure_default():
        nonlocal default_mat
        if default_mat is None:
            default_mat = len(scene.materials)
            scene.materials.append(Material(
                type=0, color=np.asarray([0.5, 0.5, 0.5], np.float32)))
        return default_mat

    def emit_shape(shape: Shape):
        mat = cur_mat if cur_mat >= 0 else ensure_default()
        if cur_emission is not None:
            m2 = Material(
                type=0, color=scene.materials[mat].color,
                emission=np.asarray(cur_emission, np.float32))
            mat = len(scene.materials)
            scene.materials.append(m2)
        scene.instances.append(Instance(
            frame=_mat_to_frame(ctm), shape=len(scene.shapes), material=mat))
        scene.shapes.append(shape)

    while True:
        tok = p.next()
        if tok is None:
            break
        if tok == "LookAt":
            v = [float(p.next()) for _ in range(9)]
            eye, look, up = (np.asarray(v[0:3], np.float32),
                             np.asarray(v[3:6], np.float32),
                             np.asarray(v[6:9], np.float32))
            frame = _lookat_frame(eye, look, up)
            m = np.eye(4, dtype=np.float32)
            m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3] = (
                frame[0], frame[1], frame[2], frame[3])
            ctm = ctm @ m  # camera-to-world for a following Camera directive
        elif tok == "Camera":
            ctype = p.next().strip('"')
            camera_decl = (ctype, p.params(), ctm.copy())
        elif tok == "Film":
            p.next()  # film type
            params = p.params()
            xres = _f(params, "xresolution", default=1280)
            yres = _f(params, "yresolution", default=720)
            film_aspect = xres / max(yres, 1)
        elif tok == "Translate":
            ctm = ctm @ _translate(*[float(p.next()) for _ in range(3)])
        elif tok == "Scale":
            ctm = ctm @ _scale(*[float(p.next()) for _ in range(3)])
        elif tok == "Rotate":
            ctm = ctm @ _rotate(*[float(p.next()) for _ in range(4)])
        elif tok in ("Transform", "ConcatTransform"):
            vals = p.values()
            m = np.asarray(vals, np.float32).reshape(4, 4).T
            ctm = m if tok == "Transform" else ctm @ m
        elif tok == "Identity":
            ctm = np.eye(4, dtype=np.float32)
        elif tok in ("WorldBegin",):
            ctm = np.eye(4, dtype=np.float32)
        elif tok in ("AttributeBegin", "TransformBegin", "ObjectBegin"):
            if tok == "ObjectBegin":
                p.next()
            stack.append((ctm.copy(), cur_mat, cur_emission))
        elif tok in ("AttributeEnd", "TransformEnd", "ObjectEnd"):
            if stack:
                ctm, cur_mat, cur_emission = stack.pop()
        elif tok == "Texture":
            name = p.next().strip('"')
            p.next()  # value type
            tclass = p.next().strip('"')
            params = p.params()
            if tclass == "imagemap":
                path = params.get("filename", [""])[0]
                tex = Texture(width=8, height=8, linear=False,
                              pixels=np.full((8, 8, 4), 0.5, np.float32))
                tex.pixels[..., 3] = 1.0
                try:
                    from . import image_io

                    pixels, linear = image_io.load_image(
                        os.path.join(dirname, str(path)))
                    tex.pixels, tex.linear = pixels, linear
                    tex.height, tex.width = pixels.shape[0], pixels.shape[1]
                except (FileNotFoundError, ValueError):
                    pass
                named_tex[name] = len(scene.textures)
                scene.textures.append(tex)
        elif tok == "Material":
            mtype = p.next().strip('"')
            mat = _convert_material(mtype, p.params(), named_tex,
                                    scene.textures)
            cur_mat = len(scene.materials)
            scene.materials.append(mat)
        elif tok == "MakeNamedMaterial":
            name = p.next().strip('"')
            params = p.params()
            mtype = str(params.get("type", ["matte"])[0])
            named_materials[name] = len(scene.materials)
            scene.materials.append(
                _convert_material(mtype, params, named_tex, scene.textures))
        elif tok == "NamedMaterial":
            cur_mat = named_materials.get(p.next().strip('"'), cur_mat)
        elif tok == "AreaLightSource":
            p.next()  # "diffuse"
            params = p.params()
            cur_emission = _rgb(params, "L", "radiance", default=(1, 1, 1))
        elif tok == "LightSource":
            ltype = p.next().strip('"')
            params = p.params()
            if ltype == "infinite":
                emission_tex = -1
                if "mapname" in params or "filename" in params:
                    path = str(params.get("mapname",
                                          params.get("filename"))[0])
                    tex = Texture(width=8, height=8, linear=True,
                                  pixels=np.ones((8, 8, 4), np.float32))
                    try:
                        from . import image_io

                        pixels, linear = image_io.load_image(
                            os.path.join(dirname, path))
                        tex.pixels, tex.linear = pixels, linear
                        tex.height, tex.width = (
                            pixels.shape[0], pixels.shape[1])
                    except (FileNotFoundError, ValueError):
                        pass
                    emission_tex = len(scene.textures)
                    scene.textures.append(tex)
                scene.environments.append(Environment(
                    frame=_mat_to_frame(ctm),
                    emission=_rgb(params, "L", "scale", default=(1, 1, 1)),
                    emission_tex=emission_tex))
        elif tok == "Shape":
            stype = p.next().strip('"')
            params = p.params()
            if stype == "trianglemesh":
                P = np.asarray(params.get("P", []), np.float32).reshape(-1, 3)
                idx = np.asarray(
                    params.get("indices", []), np.int64).reshape(-1, 3)
                N = params.get("N")
                UV = params.get("uv", params.get("st"))
                emit_shape(Shape(
                    positions=P,
                    normals=(np.asarray(N, np.float32).reshape(-1, 3)
                             if N else None),
                    texcoords=(np.asarray(UV, np.float32).reshape(-1, 2)
                               if UV else None),
                    triangles=idx.astype(np.int32)))
            elif stype == "plymesh":
                path = str(params.get("filename", [""])[0])
                try:
                    from .ply import load_ply

                    d = load_ply(os.path.join(dirname, path))
                    emit_shape(Shape(
                        positions=d.get("positions"),
                        normals=d.get("normals"),
                        texcoords=d.get("texcoords"),
                        triangles=d.get("triangles"),
                        quads=d.get("quads")))
                except (FileNotFoundError, ValueError):
                    pass
            elif stype == "sphere":
                from .procedural import make_uvsphere

                r = _f(params, "radius", default=1.0)
                sph = make_uvsphere((64, 32), r)
                emit_shape(Shape(
                    positions=sph["positions"], normals=sph["normals"],
                    texcoords=sph["texcoords"], quads=sph["quads"]))
        elif tok.startswith('"') or tok == "[" or _is_num(tok):
            continue  # stray values of an unhandled directive
        else:
            # unhandled directive (Integrator, Sampler, PixelFilter, ...):
            # consume its type string + params
            if p.peek() is not None and p.peek().startswith('"'):
                if " " not in p.peek().strip('"'):
                    p.next()
                p.params()

    # camera: pbrt fov is in degrees on the shorter axis
    if camera_decl is not None:
        ctype, params, cam_ctm = camera_decl
        aspect = film_aspect or 16 / 9
        film = 0.036
        fov = np.radians(_f(params, "fov", default=90.0))
        short = film / aspect if aspect >= 1 else film
        lens = short / (2.0 * np.tan(fov / 2.0))
        scene.cameras.append(Camera(
            frame=_mat_to_frame(cam_ctm), lens=float(lens), film=film,
            aspect=float(aspect), focus=10.0))

    from .sceneio import add_missing_camera, add_missing_material

    add_missing_material(scene)
    add_missing_camera(scene)
    return scene
