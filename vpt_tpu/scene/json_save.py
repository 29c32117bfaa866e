"""JSON scene saver (yocto format v4.2) — the save side of json_io.py.

Mirrors the reference save_json_scene (/root/reference/libs/yocto/
yocto_sceneio.cpp:3868-4100): the scene JSON goes to <path>, shapes to
shapes/<name>.ply, textures to textures/<name>.{png|hdr}, subdivs to
subdivs/<name>.obj, and (our volumetric extension, matching the author's
load-side schema, yocto_sceneio.cpp:3654-3778) volumes to
volumes/<name>.sdf. Values equal to the schema defaults are omitted, like
the reference's set_val. Round-trip is tested in tests/test_sceneio.py:
load -> save -> load yields the same flattened scene arrays.
"""

from __future__ import annotations

import json
import os

import numpy as np

from . import image_io, schema
from .obj import save_obj_shape
from .ply import save_ply
from .volume_io import save_sdf_volume

IDENTITY = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)


def _set(el: dict, key, value, default=None):
    if isinstance(value, np.ndarray):
        if default is not None and np.array_equal(value, default):
            return
        el[key] = [float(x) for x in np.asarray(value).reshape(-1)]
        return
    if isinstance(value, (np.floating, np.integer)):
        value = value.item()
    if value == default:
        return
    el[key] = value


def _set_ref(el: dict, key, value):
    if value is not None and int(value) >= 0:
        el[key] = int(value)


def _name(obj, prefix, idx):
    return obj.name if getattr(obj, "name", "") else f"{prefix}{idx}"


def _shape_dict(s) -> dict:
    return {
        "positions": s.positions,
        "normals": s.normals,
        "texcoords": s.texcoords,
        "colors": s.colors,
        "radius": s.radius,
        "triangles": s.triangles,
        "quads": s.quads,
        "lines": s.lines,
        "points": s.points,
    }


def save_shape(path: str, shape) -> None:
    """save_shape parity (yocto_sceneio.cpp:1028): dispatch on extension.
    `shape` is a schema.Shape or a shape dict."""
    d = shape if isinstance(shape, dict) else _shape_dict(shape)
    ext = os.path.splitext(path)[1].lower()
    if ext == ".ply":
        save_ply(path, d)
    elif ext == ".obj":
        save_obj_shape(path, d)
    elif ext == ".stl":
        from .obj import quads_to_triangles
        from .stl import save_stl

        tris = d.get("triangles")
        if tris is None or len(tris) == 0:
            quads = d.get("quads")
            if quads is None or len(quads) == 0:
                raise ValueError(f"{path}: empty shape")
            tris = quads_to_triangles(quads)
        save_stl(path, d["positions"], tris)
    else:
        raise ValueError(f"unsupported shape format: {path}")


def save_texture(path: str, tex) -> None:
    """PNG for sRGB byte textures, HDR for linear float (reference
    save_texture, yocto_sceneio.cpp:509-560 via stb)."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".png":
        img = np.clip(np.asarray(tex.pixels, np.float32), 0.0, 1.0)
        image_io.save_png(path, img)
    elif ext in (".hdr", ".pic"):
        image_io.save_hdr(path, np.asarray(tex.pixels, np.float32)[..., :3])
    elif ext in (".jpg", ".jpeg"):
        from .jpeg import save_jpeg

        img = np.clip(np.asarray(tex.pixels, np.float32), 0.0, 1.0)
        save_jpeg(path, (img[..., :3] * 255 + 0.5).astype(np.uint8))
    else:
        raise ValueError(f"unsupported texture format: {path}")


def save_json_scene(path: str, scene) -> None:
    dirname = os.path.dirname(path) or "."
    doc = {"asset": {"generator": "vpt_tpu", "version": "4.2"}}
    if scene.copyright:
        doc["asset"]["copyright"] = scene.copyright

    if scene.cameras:
        doc["cameras"] = group = []
        for i, c in enumerate(scene.cameras):
            el = {}
            _set(el, "name", _name(c, "camera", i), "")
            _set(el, "frame", c.frame, IDENTITY)
            _set(el, "orthographic", bool(c.orthographic), False)
            _set(el, "lens", float(c.lens), 0.050)
            _set(el, "aspect", float(c.aspect), 1.5)
            _set(el, "film", float(c.film), 0.036)
            _set(el, "focus", float(c.focus), 10000.0)
            _set(el, "aperture", float(c.aperture), 0.0)
            group.append(el)

    tex_uris = []
    if scene.textures:
        doc["textures"] = group = []
        for i, t in enumerate(scene.textures):
            name = _name(t, "texture", i)
            uri = f"textures/{name}" + (".hdr" if t.linear else ".png")
            tex_uris.append(uri)
            group.append({"name": name, "uri": uri})

    zero3 = np.zeros(3, np.float32)
    if scene.materials:
        doc["materials"] = group = []
        for i, m in enumerate(scene.materials):
            el = {}
            _set(el, "name", _name(m, "material", i), "")
            _set(el, "type", schema.MATERIAL_TYPES[m.type], "matte")
            _set(el, "emission", np.asarray(m.emission, np.float32), zero3)
            _set(el, "color", np.asarray(m.color, np.float32), zero3)
            _set(el, "metallic", float(m.metallic), 0.0)
            _set(el, "roughness", float(m.roughness), 0.0)
            _set(el, "ior", float(m.ior), 1.5)
            _set(el, "trdepth", float(m.trdepth), 0.01)
            _set(el, "scattering", np.asarray(m.scattering, np.float32), zero3)
            _set(el, "scanisotropy", float(m.scanisotropy), 0.0)
            _set(el, "opacity", float(m.opacity), 1.0)
            _set_ref(el, "emission_tex", m.emission_tex)
            _set_ref(el, "color_tex", m.color_tex)
            _set_ref(el, "roughness_tex", m.roughness_tex)
            _set_ref(el, "scattering_tex", m.scattering_tex)
            _set_ref(el, "normal_tex", m.normal_tex)
            group.append(el)

    shape_uris = []
    if scene.shapes:
        doc["shapes"] = group = []
        for i, s in enumerate(scene.shapes):
            name = _name(s, "shape", i)
            uri = f"shapes/{name}.ply"
            shape_uris.append(uri)
            group.append({"name": name, "uri": uri})

    vol_uris = []
    if scene.volumes:
        doc["volumes"] = group = []
        for i, v in enumerate(scene.volumes):
            name = _name(v, "volume", i)
            uri = f"volumes/{name}.sdf"
            vol_uris.append(uri)
            group.append({"name": name, "uri": uri})

    if scene.sdfs:
        doc["sdfunctions"] = group = []
        for i, s in enumerate(scene.sdfs):
            el = {}
            _set(el, "name", _name(s, "sdf", i), "")
            stype = schema.SDF_TYPES[s.type]
            el["type"] = stype
            if stype == "bbox":
                _set(el, "whd", np.asarray(s.params[:3], np.float32))
                _set(el, "thickness", float(s.params[3]))
            elif stype == "box":
                _set(el, "whd", np.asarray(s.params[:3], np.float32))
            elif stype == "capped_cone":
                _set(el, "height", float(s.params[0]))
                _set(el, "r1", float(s.params[1]))
                _set(el, "r2", float(s.params[2]))
            elif stype == "sphere":
                _set(el, "radius", float(s.params[0]))
            elif stype == "torus":
                _set(el, "r1", float(s.params[0]))
                _set(el, "r2", float(s.params[1]))
            _set(el, "frame", s.frame, IDENTITY)
            _set_ref(el, "material", s.material)
            group.append(el)

    subdiv_uris = []
    if scene.subdivs:
        doc["subdivs"] = group = []
        for i, sd in enumerate(scene.subdivs):
            name = _name(sd, "subdiv", i)
            uri = f"subdivs/{name}.obj"
            subdiv_uris.append(uri)
            el = {"name": name, "uri": uri}
            _set_ref(el, "shape", sd.shape)
            _set(el, "subdivisions", int(sd.subdivisions), 0)
            _set(el, "catmullclark", bool(sd.catmullclark), True)
            _set(el, "smooth", bool(sd.smooth), True)
            _set(el, "displacement", float(sd.displacement), 0.0)
            _set_ref(el, "displacement_tex", sd.displacement_tex)
            group.append(el)

    if scene.instances:
        doc["instances"] = group = []
        for i, inst in enumerate(scene.instances):
            el = {}
            _set(el, "name", _name(inst, "instance", i), "")
            _set(el, "frame", inst.frame, IDENTITY)
            _set_ref(el, "shape", inst.shape)
            _set_ref(el, "material", inst.material)
            group.append(el)

    if scene.vol_instances:
        doc["vol_instances"] = group = []
        for i, vi in enumerate(scene.vol_instances):
            el = {}
            _set(el, "name", _name(vi, "vol_instance", i), "")
            _set(el, "frame", vi.frame, IDENTITY)
            _set_ref(el, "volume", vi.volume)
            _set_ref(el, "material", vi.material)
            _set(el, "scale", float(vi.scalef), 1.0)
            group.append(el)

    if scene.environments:
        doc["environments"] = group = []
        for i, e in enumerate(scene.environments):
            el = {}
            _set(el, "name", _name(e, "environment", i), "")
            _set(el, "frame", e.frame, IDENTITY)
            _set(el, "emission", np.asarray(e.emission, np.float32), zero3)
            _set_ref(el, "emission_tex", e.emission_tex)
            group.append(el)

    # write resources
    for sub in ("shapes", "textures", "subdivs", "volumes"):
        if doc.get(sub):
            os.makedirs(os.path.join(dirname, sub), exist_ok=True)
    for uri, s in zip(shape_uris, scene.shapes):
        save_shape(os.path.join(dirname, uri), s)
    for uri, t in zip(tex_uris, scene.textures):
        save_texture(os.path.join(dirname, uri), t)
    for uri, v in zip(vol_uris, scene.volumes):
        save_sdf_volume(os.path.join(dirname, uri), v.whd, v.values, v.res)
    for uri, sd in zip(subdiv_uris, scene.subdivs):
        _save_subdiv_obj(os.path.join(dirname, uri), sd)

    with open(path, "w") as f:
        json.dump(doc, f, indent=2)


def _save_subdiv_obj(path: str, sd) -> None:
    """Face-varying OBJ: separate f v/vt/vn index triples per corner
    (reference save_subdiv -> save_fvshape, yocto_sceneio.cpp:1146)."""
    out = []
    for p in np.asarray(sd.positions, np.float32):
        out.append(f"v {p[0]:.8g} {p[1]:.8g} {p[2]:.8g}")
    has_t = sd.texcoords is not None and sd.quadstexcoord is not None
    has_n = sd.normals is not None and sd.quadsnorm is not None
    if has_t:
        for t in np.asarray(sd.texcoords, np.float32):
            out.append(f"vt {t[0]:.8g} {t[1]:.8g}")
    if has_n:
        for n in np.asarray(sd.normals, np.float32):
            out.append(f"vn {n[0]:.8g} {n[1]:.8g} {n[2]:.8g}")
    qp = np.asarray(sd.quadspos, np.int64)
    qt = np.asarray(sd.quadstexcoord, np.int64) if has_t else None
    qn = np.asarray(sd.quadsnorm, np.int64) if has_n else None
    for fi in range(qp.shape[0]):
        corners = []
        # degenerate quads (q.z == q.w) are written as triangles
        idxs = range(3) if qp[fi, 2] == qp[fi, 3] else range(4)
        for c in idxs:
            s = str(qp[fi, c] + 1)
            if has_t and has_n:
                s += f"/{qt[fi, c] + 1}/{qn[fi, c] + 1}"
            elif has_t:
                s += f"/{qt[fi, c] + 1}"
            elif has_n:
                s += f"//{qn[fi, c] + 1}"
            corners.append(s)
        out.append("f " + " ".join(corners))
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


def save_scene(path: str, scene) -> None:
    """save_scene dispatch (yocto_sceneio.cpp:2697-2736). JSON saves the
    full scene; PLY/OBJ/STL save the first shape only (reference parity:
    'saves only one mesh with no other data')."""
    ext = os.path.splitext(path)[1].lower()
    if ext == ".json":
        save_json_scene(path, scene)
    elif ext == ".obj":
        save_obj_scene(path, scene)
    elif ext == ".gltf":
        save_gltf_scene(path, scene)
    elif ext == ".pbrt":
        save_pbrt_scene(path, scene)
    elif ext in (".ply", ".stl"):
        if not scene.shapes:
            raise ValueError(f"{path}: scene has no shapes")
        save_shape(path, scene.shapes[0])
    else:
        raise ValueError(f"unsupported scene format: {path}")


# ---------------------------------------------------------------------------
# OBJ scene save (reference save_obj_scene, yocto_sceneio.cpp:2641): the
# whole scene in one .obj (instance frames baked into world-space vertices,
# one `o`/`usemtl` group per instance) + a .mtl inverting the load-side
# conversion heuristics (sceneio.py _parse_mtl), so load(save(scene))
# reproduces the material classes.
# ---------------------------------------------------------------------------

def _roughness_to_exponent(r: float) -> float:
    if r <= 0.0:
        return 1e9
    return max(2.0 / (r ** 4) - 2.0, 0.0)


def save_obj_scene(path: str, scene) -> None:
    from . import schema as _schema

    base = os.path.splitext(path)[0]
    dirname = os.path.dirname(path) or "."
    mtl_name = os.path.basename(base) + ".mtl"

    tex_uris = {}
    if scene.textures:
        os.makedirs(os.path.join(dirname, "textures"), exist_ok=True)
    for i, t in enumerate(scene.textures):
        name = _name(t, "texture", i)
        uri = f"textures/{name}" + (".hdr" if t.linear else ".png")
        tex_uris[i] = uri
        save_texture(os.path.join(dirname, uri), t)

    mtl = []
    for i, m in enumerate(scene.materials):
        mtl.append(f"newmtl {_name(m, 'material', i)}")
        e = np.asarray(m.emission, np.float32)
        c = np.asarray(m.color, np.float32)
        if np.any(e != 0):
            mtl.append(f"Ke {e[0]:.6g} {e[1]:.6g} {e[2]:.6g}")
        tname = _schema.MATERIAL_TYPES[m.type]
        if tname in ("transparent", "refractive"):
            mtl.append(f"Kt {c[0]:.6g} {c[1]:.6g} {c[2]:.6g}")
            if m.color_tex >= 0:
                mtl.append(f"map_Kt {tex_uris[m.color_tex]}")
        elif tname == "reflective":
            mtl.append(f"Ks {c[0]:.6g} {c[1]:.6g} {c[2]:.6g}")
            if m.color_tex >= 0:
                mtl.append(f"map_Ks {tex_uris[m.color_tex]}")
        elif tname == "glossy":
            mtl.append(f"Kd {c[0]:.6g} {c[1]:.6g} {c[2]:.6g}")
            mtl.append("Ks 0.04 0.04 0.04")
            if m.color_tex >= 0:
                mtl.append(f"map_Kd {tex_uris[m.color_tex]}")
        else:
            mtl.append(f"Kd {c[0]:.6g} {c[1]:.6g} {c[2]:.6g}")
            if m.color_tex >= 0:
                mtl.append(f"map_Kd {tex_uris[m.color_tex]}")
        mtl.append(f"Ns {min(_roughness_to_exponent(float(m.roughness)), 1e9):.6g}")
        if m.ior != 1.5:
            mtl.append(f"Ni {float(m.ior):.6g}")
        if m.opacity != 1.0:
            mtl.append(f"d {float(m.opacity):.6g}")
        if m.normal_tex >= 0:
            mtl.append(f"map_bump {tex_uris[m.normal_tex]}")
        if m.emission_tex >= 0:
            mtl.append(f"map_Ke {tex_uris[m.emission_tex]}")
        mtl.append("")
    with open(os.path.join(dirname, mtl_name), "w") as f:
        f.write("\n".join(mtl))

    out = [f"mtllib {mtl_name}"]
    voff = toff = noff = 0
    for ii, inst in enumerate(scene.instances):
        sh = scene.shapes[inst.shape]
        fr = np.asarray(inst.frame, np.float32)
        pos = np.asarray(sh.positions, np.float32) @ fr[:3] + fr[3]
        nrm = sh.normals
        if nrm is not None:
            nrm = np.asarray(nrm, np.float32) @ fr[:3]
        tc = sh.texcoords
        out.append(f"o {_name(inst, 'instance', ii)}")
        mat = scene.materials[inst.material] if inst.material >= 0 else None
        if mat is not None:
            out.append(f"usemtl {_name(mat, 'material', inst.material)}")
        for p in pos:
            out.append(f"v {p[0]:.8g} {p[1]:.8g} {p[2]:.8g}")
        if tc is not None:
            for t in np.asarray(tc, np.float32):
                out.append(f"vt {t[0]:.8g} {t[1]:.8g}")
        if nrm is not None:
            for n in nrm:
                out.append(f"vn {n[0]:.8g} {n[1]:.8g} {n[2]:.8g}")

        def vref(i):
            vi = voff + int(i) + 1
            ti = toff + int(i) + 1
            ni = noff + int(i) + 1
            if tc is not None and nrm is not None:
                return f"{vi}/{ti}/{ni}"
            if tc is not None:
                return f"{vi}/{ti}"
            if nrm is not None:
                return f"{vi}//{ni}"
            return str(vi)

        for key, rec in (("triangles", "f"), ("quads", "f"),
                         ("lines", "l"), ("points", "p")):
            idx = getattr(sh, key)
            if idx is None or len(idx) == 0:
                continue
            for row in np.asarray(idx, np.int64).reshape(len(idx), -1):
                out.append(rec + " " + " ".join(vref(i) for i in row))
        voff += pos.shape[0]
        toff += 0 if tc is None else len(tc)
        noff += 0 if nrm is None else len(nrm)
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")


# ---------------------------------------------------------------------------
# glTF 2.0 scene save (reference save_gltf_scene, yocto_sceneio.cpp:2659):
# one .bin buffer, positions/normals/texcoords/indices accessors per shape,
# pbrMetallicRoughness materials, one node per instance with a column-major
# matrix. Round-trips through scene/gltf.py.
# ---------------------------------------------------------------------------

def save_gltf_scene(path: str, scene) -> None:
    from .obj import quads_to_triangles

    dirname = os.path.dirname(path) or "."
    bin_name = os.path.splitext(os.path.basename(path))[0] + ".bin"
    blob = bytearray()
    views, accessors, meshes = [], [], []

    def add_view(data: bytes):
        off = len(blob)
        blob.extend(data)
        blob.extend(b"\x00" * ((-len(blob)) % 4))
        views.append({"buffer": 0, "byteOffset": off, "byteLength": len(data)})
        return len(views) - 1

    def add_accessor(view, ctype, count, atype, arr=None):
        acc = {"bufferView": view, "componentType": ctype, "count": count,
               "type": atype}
        if arr is not None and atype == "VEC3":
            acc["min"] = [float(x) for x in arr.min(0)]
            acc["max"] = [float(x) for x in arr.max(0)]
        accessors.append(acc)
        return len(accessors) - 1

    for si, sh in enumerate(scene.shapes):
        pos = np.asarray(sh.positions, np.float32)
        attrs = {"POSITION": add_accessor(
            add_view(pos.tobytes()), 5126, pos.shape[0], "VEC3", pos)}
        if sh.normals is not None:
            n = np.asarray(sh.normals, np.float32)
            attrs["NORMAL"] = add_accessor(
                add_view(n.tobytes()), 5126, n.shape[0], "VEC3")
        if sh.texcoords is not None:
            t = np.asarray(sh.texcoords, np.float32)
            attrs["TEXCOORD_0"] = add_accessor(
                add_view(t.tobytes()), 5126, t.shape[0], "VEC2")
        tris = sh.triangles
        if (tris is None or len(tris) == 0) and sh.quads is not None:
            tris = quads_to_triangles(np.asarray(sh.quads))
        prim = {"attributes": attrs}
        if tris is not None and len(tris):
            idx = np.asarray(tris, np.uint32).reshape(-1)
            prim["indices"] = add_accessor(
                add_view(idx.tobytes()), 5125, idx.size, "SCALAR")
        meshes.append({"name": _name(sh, "shape", si),
                       "primitives": [prim]})

    materials = []
    for i, m in enumerate(scene.materials):
        c = np.asarray(m.color, np.float32)
        el = {"name": _name(m, "material", i),
              "pbrMetallicRoughness": {
                  "baseColorFactor": [float(c[0]), float(c[1]), float(c[2]),
                                      float(m.opacity)],
                  "metallicFactor": float(m.metallic),
                  "roughnessFactor": float(m.roughness)}}
        e = np.asarray(m.emission, np.float32)
        if np.any(e != 0):
            el["emissiveFactor"] = [float(min(x, 1.0)) for x in e]
        materials.append(el)

    nodes = []
    for ii, inst in enumerate(scene.instances):
        fr = np.asarray(inst.frame, np.float32)
        mat4 = np.eye(4, dtype=np.float32)
        mat4[:3, :3] = fr[:3].T
        mat4[:3, 3] = fr[3]
        node = {"name": _name(inst, "instance", ii), "mesh": int(inst.shape),
                "matrix": [float(x) for x in mat4.T.reshape(-1)]}
        nodes.append(node)
        if inst.material >= 0 and meshes[inst.shape]["primitives"][0].get(
                "material") is None:
            meshes[inst.shape]["primitives"][0]["material"] = int(
                inst.material)

    doc = {
        "asset": {"version": "2.0", "generator": "vpt_tpu"},
        "buffers": [{"uri": bin_name, "byteLength": len(blob)}],
        "bufferViews": views,
        "accessors": accessors,
        "meshes": meshes,
        "nodes": nodes,
        "scenes": [{"nodes": list(range(len(nodes)))}],
        "scene": 0,
    }
    if materials:
        doc["materials"] = materials
    with open(os.path.join(dirname, bin_name), "wb") as f:
        f.write(bytes(blob))
    with open(path, "w") as f:
        json.dump(doc, f)


# ---------------------------------------------------------------------------
# PBRT scene save (reference save_pbrt_scene, yocto_sceneio.cpp:2667 — the
# reference itself documents this path as "not robust at all"): LookAt-less
# camera via Transform, trianglemesh shapes with baked frames, matte/glass
# materials, diffuse area lights, infinite light for environments. Stays
# within the subset scene/pbrt.py parses, so load(save(scene)) round-trips.
# ---------------------------------------------------------------------------

def save_pbrt_scene(path: str, scene) -> None:
    from .obj import quads_to_triangles

    out = []
    if scene.cameras:
        c = scene.cameras[0]
        fr = np.asarray(c.frame, np.float32)
        eye = fr[3]
        center = fr[3] - fr[2]
        up = fr[1]
        out.append("LookAt " + " ".join(
            f"{v:.8g}" for v in list(eye) + list(center) + list(up)))
        import math

        fov = 2 * math.degrees(math.atan(
            0.5 * float(c.film) / max(float(c.aspect), 1.0) / float(c.lens)))
        out.append(f'Camera "perspective" "float fov" [{fov:.6g}]')
        w = 720
        out.append(f'Film "rgb" "integer xresolution" [{w}] '
                   f'"integer yresolution" [{int(w / float(c.aspect))}]')
    out.append("WorldBegin")
    for e in scene.environments:
        em = np.asarray(e.emission, np.float32)
        if np.any(em != 0):
            out.append(f'LightSource "infinite" "rgb L" '
                       f'[{em[0]:.6g} {em[1]:.6g} {em[2]:.6g}]')
    for ii, inst in enumerate(scene.instances):
        sh = scene.shapes[inst.shape]
        m = scene.materials[inst.material] if inst.material >= 0 else None
        tris = sh.triangles
        if (tris is None or len(tris) == 0) and sh.quads is not None:
            tris = quads_to_triangles(np.asarray(sh.quads))
        if tris is None or len(tris) == 0:
            continue
        fr = np.asarray(inst.frame, np.float32)
        pos = np.asarray(sh.positions, np.float32) @ fr[:3] + fr[3]
        out.append("AttributeBegin")
        if m is not None and np.any(np.asarray(m.emission) != 0):
            e = np.asarray(m.emission, np.float32)
            out.append(f'  AreaLightSource "diffuse" "rgb L" '
                       f'[{e[0]:.6g} {e[1]:.6g} {e[2]:.6g}]')
        elif m is not None:
            tname = schema.MATERIAL_TYPES[m.type]
            c = np.asarray(m.color, np.float32)
            if tname in ("refractive", "transparent"):
                out.append('  Material "glass"')
            else:
                out.append(f'  Material "matte" "rgb Kd" '
                           f'[{c[0]:.6g} {c[1]:.6g} {c[2]:.6g}]')
        p_flat = " ".join(f"{v:.8g}" for v in pos.reshape(-1))
        i_flat = " ".join(str(int(v)) for v in np.asarray(tris).reshape(-1))
        out.append(f'  Shape "trianglemesh" "point3 P" [{p_flat}] '
                   f'"integer indices" [{i_flat}]')
        out.append("AttributeEnd")
    with open(path, "w") as f:
        f.write("\n".join(out) + "\n")
