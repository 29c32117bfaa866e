"""JSON scene loader (yocto format v4.2/5.0) including the author's
`volumes` / `vol_instances` / `sdfunctions` extensions.

Mirrors load_json_scene (/root/reference/libs/yocto/yocto_sceneio.cpp:3544-3860).
Missing-asset recovery: several reference scenes reference files that are not
checked in (subdivs/ dir, sphere-displaced.obj, shape1.ply, sdfs/*.sdf); we
fall back to sensible substitutes so every scene loads (see _load_shape_file /
synthesize helpers).
"""

from __future__ import annotations

import json
import os

import numpy as np

from . import image_io, obj as obj_io, ply as ply_io, schema
from .schema import (
    Camera, Environment, HostScene, Instance, Material, Sdf, Shape, Subdiv,
    Texture, VolInstance, VolumeGrid,
)
from .volume_io import load_sdf_volume


def _frame(vals):
    if vals is None:
        return schema.np.array(
            [[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32
        )
    return np.asarray(vals, np.float32).reshape(4, 3)


IDENTITY = _frame(None)


_SYNTH_LOCK = __import__("threading").Lock()


def _pmap(fn, n: int, workers: int = 8):
    """Parallel resource map (reference: parallel_for over scene resources,
    yocto_sceneio.cpp:3829-3857). Order-preserving; serial for n <= 1."""
    if n <= 1:
        return [fn(i) for i in range(n)]
    from concurrent.futures import ThreadPoolExecutor

    with ThreadPoolExecutor(max_workers=min(workers, n)) as ex:
        return list(ex.map(fn, range(n)))


def _load_shape_file(path: str) -> dict:
    if path.lower().endswith(".ply"):
        return ply_io.load_ply(path)
    if path.lower().endswith(".obj"):
        return obj_io.load_obj_shape(path)
    if path.lower().endswith(".stl"):
        from .stl import load_stl

        return load_stl(path)
    raise ValueError(f"unsupported shape format: {path}")


def _synthesize_shape(name: str) -> dict:
    """Stand-ins for assets referenced by scenes but absent from the reference
    repo (e.g. sphere-displaced.obj, shape1.ply)."""
    from .procedural import make_sphere_fv, make_sphere_shape

    lname = name.lower()
    scale = 0.075 if "sphere" in lname else 0.15
    steps = 32 if "sphere" in lname else 64
    s = make_sphere_shape(steps=steps, scale=scale, uvscale=1.0)
    # reference scenes place objects with identity frames sitting on the
    # y=0 floor (cf. shapes/sphere.ply centered at y=0.075)
    s["positions"] = s["positions"] + np.array([0, scale, 0], np.float32)
    return s


def load_json_scene(path: str) -> HostScene:
    with open(path) as f:
        doc = json.load(f)
    version = doc.get("asset", {}).get("version")
    # legacy formats (yocto_sceneio.cpp:3551-3555): no version key -> 4.0
    # (name-keyed groups, string refs, lookat); "4.1" -> 4.1 (name-keyed
    # groups, string refs, datafile uris). Anything else must be 4.2/5.0.
    if version is None:
        return _load_json_scene_v40(path, doc)
    if version == "4.1":
        return _load_json_scene_v41(path, doc)
    if version not in ("4.2", "5.0"):
        raise ValueError(f"unsupported scene version {version!r}")
    scene = HostScene()
    scene.copyright = doc.get("asset", {}).get("copyright", "")
    dirname = os.path.dirname(path)

    for el in doc.get("cameras", []):
        scene.cameras.append(
            Camera(
                frame=_frame(el.get("frame")),
                orthographic=bool(el.get("orthographic", False)),
                lens=float(el.get("lens", 0.050)),
                aspect=float(el.get("aspect", 1.5)),
                film=float(el.get("film", 0.036)),
                focus=float(el.get("focus", 10000.0)),
                aperture=float(el.get("aperture", 0.0)),
                name=el.get("name", ""),
            )
        )

    texture_uris = []
    for el in doc.get("textures", []):
        texture_uris.append(el.get("uri", ""))
        scene.textures.append(Texture(name=el.get("name", "")))

    for el in doc.get("materials", []):
        mtype = el.get("type", "matte")
        scene.materials.append(
            Material(
                type=schema.MATERIAL_TYPES.index(mtype),
                emission=np.asarray(el.get("emission", [0, 0, 0]), np.float32),
                color=np.asarray(el.get("color", [0, 0, 0]), np.float32),
                metallic=float(el.get("metallic", 0.0)),
                roughness=float(el.get("roughness", 0.0)),
                ior=float(el.get("ior", 1.5)),
                trdepth=float(el.get("trdepth", 0.01)),
                scattering=np.asarray(el.get("scattering", [0, 0, 0]), np.float32),
                scanisotropy=float(el.get("scanisotropy", 0.0)),
                opacity=float(el.get("opacity", 1.0)),
                emission_tex=int(el.get("emission_tex", -1)),
                color_tex=int(el.get("color_tex", -1)),
                roughness_tex=int(el.get("roughness_tex", -1)),
                scattering_tex=int(el.get("scattering_tex", -1)),
                normal_tex=int(el.get("normal_tex", -1)),
                name=el.get("name", ""),
            )
        )

    shape_uris = []
    for el in doc.get("shapes", []):
        shape_uris.append(el.get("uri", ""))
        scene.shapes.append(Shape(name=el.get("name", "")))

    volume_uris, volume_binary = [], []
    for el in doc.get("volumes", []):
        volume_uris.append(el.get("uri", ""))
        volume_binary.append(bool(el.get("binary", False)))
        scene.volumes.append(VolumeGrid(name=el.get("name", "")))

    for el in doc.get("sdfunctions", []):
        stype = schema.SDF_TYPES.index(el.get("type", "box"))
        params = np.zeros(4, np.float32)
        whd = np.zeros(3, np.float32)
        if el.get("type") == "bbox":
            whd_in = np.asarray(el.get("whd", [0, 0, 0]), np.float32)
            params[:3] = whd_in
            params[3] = float(el.get("thickness", 0.0))
            whd = whd_in
        elif el.get("type") == "box":
            whd = np.asarray(el.get("whd", [0, 0, 0]), np.float32)
            params[:3] = whd
        elif el.get("type") == "capped_cone":
            params[0] = float(el.get("height", 0.0))
            params[1] = float(el.get("r1", 0.0))
            params[2] = float(el.get("r2", 0.0))
        elif el.get("type") == "sphere":
            params[0] = float(el.get("radius", 0.0))
        elif el.get("type") == "torus":
            params[0] = float(el.get("r1", 0.0))
            params[1] = float(el.get("r2", 0.0))
        scene.sdfs.append(
            Sdf(
                type=stype,
                params=params,
                whd=whd,
                frame=_frame(el.get("frame")),
                material=int(el.get("material", -1)),
                name=el.get("name", ""),
            )
        )

    subdiv_uris = []
    for el in doc.get("subdivs", []):
        subdiv_uris.append(el.get("uri", ""))
        scene.subdivs.append(
            Subdiv(
                shape=int(el.get("shape", -1)),
                subdivisions=int(el.get("subdivisions", 0)),
                catmullclark=bool(el.get("catmullclark", True)),
                smooth=bool(el.get("smooth", True)),
                displacement=float(el.get("displacement", 0.0)),
                displacement_tex=int(el.get("displacement_tex", -1)),
                name=el.get("name", ""),
            )
        )

    for el in doc.get("instances", []):
        scene.instances.append(
            Instance(
                frame=_frame(el.get("frame")),
                shape=int(el.get("shape", -1)),
                material=int(el.get("material", -1)),
                name=el.get("name", ""),
            )
        )

    for el in doc.get("vol_instances", []):
        scene.vol_instances.append(
            VolInstance(
                frame=_frame(el.get("frame")),
                volume=int(el.get("volume", -1)),
                scalef=float(el.get("scale", 1.0)),
                material=int(el.get("material", -1)),
                name=el.get("name", ""),
            )
        )

    for el in doc.get("environments", []):
        scene.environments.append(
            Environment(
                frame=_frame(el.get("frame")),
                emission=np.asarray(el.get("emission", [0, 0, 0]), np.float32),
                emission_tex=int(el.get("emission_tex", -1)),
                name=el.get("name", ""),
            )
        )

    # ---- load resources (in parallel, like the reference's parallel_for
    # over scene resources, yocto_sceneio.cpp:3829-3857; the own-codec
    # PNG/JPEG decoders are numpy-heavy and release the GIL) ----
    def load_one_shape(i):
        p = os.path.join(dirname, shape_uris[i])
        if os.path.exists(p):
            return _load_shape_file(p)
        return _synthesize_shape(os.path.basename(shape_uris[i]))

    for i, data in enumerate(_pmap(load_one_shape, len(shape_uris))):
        s = scene.shapes[i]
        s.positions = data.get("positions")
        s.normals = data.get("normals")
        s.texcoords = data.get("texcoords")
        s.colors = data.get("colors")
        s.radius = data.get("radius")
        s.triangles = data.get("triangles")
        s.quads = data.get("quads")
        s.lines = data.get("lines")
        s.points = data.get("points")

    def load_one_volume(i):
        p = os.path.join(dirname, volume_uris[i])
        if not os.path.exists(p):
            with _SYNTH_LOCK:  # sdfgen caches beside the scene
                p = _maybe_synthesize_volume(dirname, volume_uris[i])
        return load_sdf_volume(p, binary=volume_binary[i])

    for i, (whd, values, res) in enumerate(
            _pmap(load_one_volume, len(volume_uris))):
        v = scene.volumes[i]
        v.whd, v.values, v.res = whd, values, res

    for i, uri in enumerate(subdiv_uris):
        p = os.path.join(dirname, uri)
        if not os.path.exists(p):
            # reference scenes point at a nonexistent subdivs/ dir; the same
            # file lives under shapes/
            alt = os.path.join(dirname, "shapes", os.path.basename(uri))
            p = alt if os.path.exists(alt) else p
        sd = scene.subdivs[i]
        if os.path.exists(p):
            fv = obj_io.load_obj_fv(p)
        else:
            from .procedural import make_sphere_fv

            # dense enough that per-vertex displacement resolves the bump
            # texture's dots (1024^2 tex -> ~4 texels/vertex at 128 final
            # steps; at 32 the spikes alias into fat lumps), but scaled down
            # by the subdivision count so Catmull-Clark doesn't explode the
            # triangle count (each level quadruples quads)
            steps = max(8, 128 >> max(scene.subdivs[i].subdivisions, 0))
            fv = make_sphere_fv(steps=steps, scale=0.075)
        sd.quadspos = fv["quadspos"]
        sd.quadsnorm = fv["quadsnorm"]
        sd.quadstexcoord = fv["quadstexcoord"]
        sd.positions = fv["positions"]
        sd.normals = fv["normals"]
        sd.texcoords = fv["texcoords"]

    # textures referenced from material normal_tex slots need a flat-normal
    # stand-in when the file is missing (several reference tests reference
    # textures that are not checked in, e.g. 04_head1 texture1/2.png)
    normal_slots = {m.normal_tex for m in scene.materials}

    def load_one_texture(i):
        try:
            return image_io.load_image(os.path.join(dirname, texture_uris[i]))
        except FileNotFoundError:
            if i in normal_slots:
                return np.tile(
                    np.array([0.5, 0.5, 1.0, 1.0], np.float32),
                    (8, 8, 1)), False
            pixels = np.full((8, 8, 4), 0.5, np.float32)
            pixels[..., 3] = 1.0
            return pixels, False

    for i, (pixels, linear) in enumerate(
            _pmap(load_one_texture, len(texture_uris))):
        t = scene.textures[i]
        t.width, t.height = pixels.shape[1], pixels.shape[0]
        t.pixels, t.linear = pixels, linear

    return scene


def _maybe_synthesize_volume(dirname: str, uri: str) -> str:
    """Generate the missing .sdf voxel grids (see BASELINE.md note) from the
    checked-in meshes; caches next to the scene."""
    from .sdfgen import synthesize_reference_volume

    return synthesize_reference_volume(dirname, uri)


# ---------------------------------------------------------------------------
# Legacy JSON scene formats (yocto_sceneio.cpp:3551-3555):
#   4.0 (no version key): name-keyed groups, references by name, lookat
#     support, assets found by name under shapes/ textures/ subdivs/ with
#     extension search, optional PLY instance replication.
#   4.1: name-keyed groups, references by name, explicit "datafile" uris.
# ---------------------------------------------------------------------------

MATERIAL_TYPES_40 = [
    "matte", "glossy", "metallic", "transparent", "refractive",
    "subsurface", "volume", "gltfpbr",
]  # maps positionally onto MATERIAL_TYPES (yocto_sceneio.cpp:2906-2916)


def _lookat_frame(eye, center, up, offcenter=True):
    eye = np.asarray(eye, np.float32)
    center = np.asarray(center, np.float32)
    up = np.asarray(up, np.float32)
    w = eye - center
    w = w / max(np.linalg.norm(w), 1e-12)
    u = np.cross(up, w)
    u = u / max(np.linalg.norm(u), 1e-12)
    v = np.cross(w, u)
    o = eye if offcenter else center
    return np.stack([u, v, w, o]).astype(np.float32)


def _legacy_frame(el):
    if "lookat" in el:
        la = np.asarray(el["lookat"], np.float32).reshape(3, 3)
        return _lookat_frame(la[0], la[1], la[2]), float(
            np.linalg.norm(la[0] - la[1]))
    return _frame(el.get("frame")), None


def _legacy_material(key, el, texref, legacy_types):
    types = MATERIAL_TYPES_40 if legacy_types else schema.MATERIAL_TYPES
    tname = el.get("type", "matte")
    mtype = types.index(tname) if tname in types else 0
    return Material(
        type=mtype,
        emission=np.asarray(el.get("emission", [0, 0, 0]), np.float32),
        color=np.asarray(el.get("color", [0, 0, 0]), np.float32),
        metallic=float(el.get("metallic", 0.0)),
        roughness=float(el.get("roughness", 0.0)),
        ior=float(el.get("ior", 1.5)),
        trdepth=float(el.get("trdepth", 0.01)),
        scattering=np.asarray(el.get("scattering", [0, 0, 0]), np.float32),
        scanisotropy=float(el.get("scanisotropy", 0.0)),
        opacity=float(el.get("opacity", 1.0)),
        emission_tex=texref(el.get("emission_tex")),
        color_tex=texref(el.get("color_tex")),
        roughness_tex=texref(el.get("roughness_tex")),
        scattering_tex=texref(el.get("scattering_tex")),
        normal_tex=texref(el.get("normal_tex")),
        name=key,
    )


def _fill_shape(s: Shape, data: dict):
    s.positions = data.get("positions")
    s.normals = data.get("normals")
    s.texcoords = data.get("texcoords")
    s.colors = data.get("colors")
    s.radius = data.get("radius")
    s.triangles = data.get("triangles")
    s.quads = data.get("quads")
    s.lines = data.get("lines")
    s.points = data.get("points")


def _load_texture_into(scene, i, path):
    t = scene.textures[i]
    try:
        pixels, linear = image_io.load_image(path)
    except FileNotFoundError:
        normal_slots = {m.normal_tex for m in scene.materials}
        if i in normal_slots:
            pixels = np.tile(
                np.array([0.5, 0.5, 1.0, 1.0], np.float32), (8, 8, 1))
        else:
            pixels = np.full((8, 8, 4), 0.5, np.float32)
            pixels[..., 3] = 1.0
        linear = False
    t.width, t.height = pixels.shape[1], pixels.shape[0]
    t.pixels, t.linear = pixels, linear


def _find_path(dirname, group, name, extensions):
    for ext in extensions:
        p = os.path.join(dirname, group, name + ext)
        if os.path.exists(p):
            return p
    return os.path.join(dirname, group, name + extensions[0])


def _load_json_scene_v40(path: str, doc: dict) -> HostScene:
    scene = HostScene()
    scene.copyright = doc.get("asset", {}).get("copyright", "")
    dirname = os.path.dirname(path)
    tex_map, shape_map, mat_map = {}, {}, {}

    def texref(name):
        if not name:
            return -1
        if name not in tex_map:
            tex_map[name] = len(scene.textures)
            scene.textures.append(Texture(name=name))
        return tex_map[name]

    def shaperef(name):
        if not name:
            return -1
        if name not in shape_map:
            shape_map[name] = len(scene.shapes)
            scene.shapes.append(Shape(name=name))
        return shape_map[name]

    for key, el in doc.get("cameras", {}).items():
        frame, focus = _legacy_frame(el)
        scene.cameras.append(Camera(
            frame=frame,
            orthographic=bool(el.get("orthographic", el.get("ortho", False))),
            lens=float(el.get("lens", 0.050)),
            aspect=float(el.get("aspect", 1.5)),
            film=float(el.get("film", 0.036)),
            focus=float(el.get("focus", 10000.0)) if focus is None else focus,
            aperture=float(el.get("aperture", 0.0)),
            name=key,
        ))
    for key, el in doc.get("environments", {}).items():
        frame, _ = _legacy_frame(el)
        scene.environments.append(Environment(
            frame=frame,
            emission=np.asarray(el.get("emission", [0, 0, 0]), np.float32),
            emission_tex=texref(el.get("emission_tex")),
            name=key,
        ))
    for key, el in doc.get("materials", {}).items():
        mat_map[key] = len(scene.materials)
        scene.materials.append(_legacy_material(key, el, texref, True))
    ply_instance_of = {}
    for group in ("instances", "objects"):
        for key, el in doc.get(group, {}).items():
            frame, _ = _legacy_frame(el)
            idx = len(scene.instances)
            scene.instances.append(Instance(
                frame=frame,
                shape=shaperef(el.get("shape")),
                material=mat_map.get(el.get("material", ""), -1),
                name=key,
            ))
            if el.get("instance"):
                ply_instance_of[idx] = el["instance"]
    for key, el in doc.get("subdivs", {}).items():
        scene.subdivs.append(Subdiv(
            shape=shaperef(el.get("shape")),
            subdivisions=int(el.get("subdivisions", 0)),
            catmullclark=bool(el.get("catmullclark", True)),
            smooth=bool(el.get("smooth", True)),
            displacement=float(el.get("displacement", 0.0)),
            displacement_tex=texref(el.get("displacement_tex")),
            name=key,
        ))

    # resources by name with extension search
    for name, i in shape_map.items():
        p = _find_path(dirname, "shapes", name, [".ply", ".obj"])
        data = _load_shape_file(p) if os.path.exists(p) else (
            _synthesize_shape(name))
        _fill_shape(scene.shapes[i], data)
    for sd in scene.subdivs:
        p = _find_path(dirname, "subdivs", sd.name, [".ply", ".obj"])
        if os.path.exists(p):
            fv = obj_io.load_obj_fv(p)
            sd.quadspos = fv["quadspos"]
            sd.quadsnorm = fv["quadsnorm"]
            sd.quadstexcoord = fv["quadstexcoord"]
            sd.positions = fv["positions"]
            sd.normals = fv["normals"]
            sd.texcoords = fv["texcoords"]
    tex_items = list(tex_map.items())

    def _load_legacy_tex(k):
        name, i = tex_items[k]
        _load_texture_into(scene, i, _find_path(
            dirname, "textures", name, [".hdr", ".exr", ".png", ".jpg"]))

    _pmap(_load_legacy_tex, len(tex_items))

    # PLY instance replication (yocto_sceneio.cpp:3245-3280, load_instance
    # :2790: element "instance" with props xx..oz)
    if ply_instance_of:
        from .ply import load_ply_frames

        base = scene.instances
        scene.instances = []
        for idx, inst in enumerate(base):
            name = ply_instance_of.get(idx)
            if name is None:
                scene.instances.append(inst)
                continue
            frames = load_ply_frames(
                _find_path(dirname, "instances", name, [".ply"]))
            for k, fr in enumerate(frames):
                # frame * instance.frame (yocto_sceneio.cpp:3273)
                scene.instances.append(Instance(
                    frame=_compose_frames(fr, inst.frame),
                    shape=inst.shape, material=inst.material,
                    name=f"{inst.name}_{k}"))
    return scene


def _compose_frames(a: np.ndarray, b: np.ndarray) -> np.ndarray:
    """frame a * frame b (rigid 4x3 frames, rows = x/y/z/o)."""
    ra, rb = a[:3], b[:3]
    rot = rb @ ra
    o = b[3] @ ra + a[3]
    return np.vstack([rot, o]).astype(np.float32)


def _load_json_scene_v41(path: str, doc: dict) -> HostScene:
    scene = HostScene()
    scene.copyright = doc.get("asset", {}).get("copyright", "")
    dirname = os.path.dirname(path)
    tex_map, shape_map, mat_map = {}, {}, {}
    tex_files, shape_files, subdiv_files = [], [], []

    def datafile(el):
        if isinstance(el, str):
            return el
        return el.get("datafile", "")

    for key, el in doc.get("textures", {}).items():
        tex_map[key] = len(scene.textures)
        scene.textures.append(Texture(name=key))
        tex_files.append(datafile(el))

    def texref(name):
        return tex_map.get(name, -1) if name else -1

    for key, el in doc.get("cameras", {}).items():
        scene.cameras.append(Camera(
            frame=_frame(el.get("frame")),
            orthographic=bool(el.get("orthographic", False)),
            lens=float(el.get("lens", 0.050)),
            aspect=float(el.get("aspect", 1.5)),
            film=float(el.get("film", 0.036)),
            focus=float(el.get("focus", 10000.0)),
            aperture=float(el.get("aperture", 0.0)),
            name=key,
        ))
    for key, el in doc.get("materials", {}).items():
        mat_map[key] = len(scene.materials)
        scene.materials.append(_legacy_material(key, el, texref, False))
    for key, el in doc.get("shapes", {}).items():
        shape_map[key] = len(scene.shapes)
        scene.shapes.append(Shape(name=key))
        shape_files.append(datafile(el))
    for key, el in doc.get("subdivs", {}).items():
        scene.subdivs.append(Subdiv(
            shape=shape_map.get(el.get("shape", ""), -1),
            subdivisions=int(el.get("subdivisions", 0)),
            catmullclark=bool(el.get("catmullclark", True)),
            smooth=bool(el.get("smooth", True)),
            displacement=float(el.get("displacement", 0.0)),
            displacement_tex=texref(el.get("displacement_tex")),
            name=key,
        ))
        subdiv_files.append(datafile(el))
    for key, el in doc.get("instances", {}).items():
        scene.instances.append(Instance(
            frame=_frame(el.get("frame")),
            shape=shape_map.get(el.get("shape", ""), -1),
            material=mat_map.get(el.get("material", ""), -1),
            name=key,
        ))
    for key, el in doc.get("environments", {}).items():
        scene.environments.append(Environment(
            frame=_frame(el.get("frame")),
            emission=np.asarray(el.get("emission", [0, 0, 0]), np.float32),
            emission_tex=texref(el.get("emission_tex")),
            name=key,
        ))

    for i, uri in enumerate(shape_files):
        p = os.path.join(dirname, uri)
        data = _load_shape_file(p) if os.path.exists(p) else (
            _synthesize_shape(os.path.basename(uri)))
        _fill_shape(scene.shapes[i], data)
    for i, uri in enumerate(subdiv_files):
        p = os.path.join(dirname, uri)
        if os.path.exists(p):
            fv = obj_io.load_obj_fv(p)
            sd = scene.subdivs[i]
            sd.quadspos = fv["quadspos"]
            sd.quadsnorm = fv["quadsnorm"]
            sd.quadstexcoord = fv["quadstexcoord"]
            sd.positions = fv["positions"]
            sd.normals = fv["normals"]
            sd.texcoords = fv["texcoords"]
    _pmap(lambda i: _load_texture_into(
        scene, i, os.path.join(dirname, tex_files[i])), len(tex_files))
    return scene
