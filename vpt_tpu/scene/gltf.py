"""glTF 2.0 scene import (.gltf JSON + external/base64 buffers, .glb).

Mirrors load_gltf_scene (/root/reference/libs/yocto/yocto_sceneio.cpp:2659)
in scope: meshes (triangles), pbrMetallicRoughness materials -> gltfpbr,
node hierarchy flattened to world-space instance frames, perspective
cameras, PNG/JPEG images via this repo's own codecs.
"""

from __future__ import annotations

import base64
import json
import os
import struct

import numpy as np

from . import image_io
from .schema import Camera, HostScene, Instance, Material, Shape, Texture

_COMP_DTYPE = {
    5120: np.int8, 5121: np.uint8, 5122: np.int16, 5123: np.uint16,
    5125: np.uint32, 5126: np.float32,
}
_TYPE_N = {"SCALAR": 1, "VEC2": 2, "VEC3": 3, "VEC4": 4, "MAT4": 16}


def _load_buffers(doc: dict, dirname: str, glb_bin: bytes | None):
    out = []
    for buf in doc.get("buffers", []):
        uri = buf.get("uri")
        if uri is None:
            out.append(glb_bin or b"")
        elif uri.startswith("data:"):
            out.append(base64.b64decode(uri.split(",", 1)[1]))
        else:
            with open(os.path.join(dirname, uri), "rb") as f:
                out.append(f.read())
    return out


def _accessor(doc, buffers, idx):
    acc = doc["accessors"][idx]
    n = _TYPE_N[acc["type"]]
    dtype = _COMP_DTYPE[acc["componentType"]]
    count = acc["count"]
    if "bufferView" not in acc:
        return np.zeros((count, n) if n > 1 else count, dtype)
    bv = doc["bufferViews"][acc["bufferView"]]
    data = buffers[bv["buffer"]]
    start = bv.get("byteOffset", 0) + acc.get("byteOffset", 0)
    itemsize = np.dtype(dtype).itemsize * n
    stride = bv.get("byteStride", itemsize)
    if stride == itemsize:
        arr = np.frombuffer(data, dtype, count * n, start).reshape(count, n)
    else:
        rows = [np.frombuffer(data, dtype, n, start + i * stride)
                for i in range(count)]
        arr = np.stack(rows)
    return arr[:, 0] if n == 1 else arr


def _node_matrix(node: dict) -> np.ndarray:
    if "matrix" in node:
        return np.asarray(node["matrix"], np.float32).reshape(4, 4).T
    m = np.eye(4, dtype=np.float32)
    if "scale" in node:
        m = m @ np.diag(list(node["scale"]) + [1.0]).astype(np.float32)
    if "rotation" in node:
        x, y, z, w = node["rotation"]
        r = np.array([
            [1 - 2 * (y * y + z * z), 2 * (x * y - z * w), 2 * (x * z + y * w)],
            [2 * (x * y + z * w), 1 - 2 * (x * x + z * z), 2 * (y * z - x * w)],
            [2 * (x * z - y * w), 2 * (y * z + x * w), 1 - 2 * (x * x + y * y)],
        ], np.float32)
        rm = np.eye(4, dtype=np.float32)
        rm[:3, :3] = r
        m = rm @ m
    if "translation" in node:
        tm = np.eye(4, dtype=np.float32)
        tm[:3, 3] = node["translation"]
        m = tm @ m
    return m


def _mat_to_frame(m: np.ndarray) -> np.ndarray:
    """Column-major-affine 4x4 -> (4,3) frame rows x,y,z,o."""
    return np.stack(
        [m[:3, 0], m[:3, 1], m[:3, 2], m[:3, 3]]).astype(np.float32)


def load_gltf_scene(filename: str) -> HostScene:
    dirname = os.path.dirname(filename)
    glb_bin = None
    if filename.lower().endswith(".glb"):
        with open(filename, "rb") as f:
            data = f.read()
        magic, version, _ = struct.unpack_from("<III", data, 0)
        if magic != 0x46546C67:
            raise ValueError(f"{filename}: not a GLB container")
        off = 12
        doc = None
        while off < len(data):
            clen, ctype = struct.unpack_from("<II", data, off)
            chunk = data[off + 8:off + 8 + clen]
            if ctype == 0x4E4F534A:  # JSON
                doc = json.loads(chunk.decode("utf-8"))
            elif ctype == 0x004E4942:  # BIN
                glb_bin = chunk
            off += 8 + clen + (-clen) % 4
        if doc is None:
            raise ValueError(f"{filename}: GLB without JSON chunk")
    else:
        with open(filename, "r", encoding="utf-8") as f:
            doc = json.load(f)

    buffers = _load_buffers(doc, dirname, glb_bin)
    scene = HostScene()

    # textures: glTF texture -> image source
    for tex in doc.get("textures", []):
        img = doc.get("images", [])[tex["source"]] if "source" in tex else {}
        t = Texture(width=8, height=8, linear=False,
                    pixels=np.full((8, 8, 4), 0.5, np.float32))
        t.pixels[..., 3] = 1.0
        try:
            if "uri" in img:
                uri = img["uri"]
                if uri.startswith("data:"):
                    raw = base64.b64decode(uri.split(",", 1)[1])
                    pixels = _decode_image(raw)
                    linear = False
                else:
                    pixels, linear = image_io.load_image(
                        os.path.join(dirname, uri))
                t.pixels, t.linear = pixels, linear
                t.height, t.width = pixels.shape[0], pixels.shape[1]
            elif "bufferView" in img:
                bv = doc["bufferViews"][img["bufferView"]]
                raw = buffers[bv["buffer"]][
                    bv.get("byteOffset", 0):
                    bv.get("byteOffset", 0) + bv["byteLength"]]
                pixels = _decode_image(raw)
                t.pixels, t.linear = pixels, False
                t.height, t.width = pixels.shape[0], pixels.shape[1]
        except (FileNotFoundError, ValueError):
            pass
        scene.textures.append(t)

    # materials -> gltfpbr (yocto does the same mapping)
    for m in doc.get("materials", []):
        pbr = m.get("pbrMetallicRoughness", {})
        base = pbr.get("baseColorFactor", [1, 1, 1, 1])
        mat = Material(type=7)
        mat.color = np.asarray(base[:3], np.float32)
        mat.opacity = float(base[3])
        mat.metallic = float(pbr.get("metallicFactor", 1.0))
        mat.roughness = float(pbr.get("roughnessFactor", 1.0))
        mat.emission = np.asarray(
            m.get("emissiveFactor", [0, 0, 0]), np.float32)
        if "baseColorTexture" in pbr:
            mat.color_tex = pbr["baseColorTexture"]["index"]
        if "emissiveTexture" in m:
            mat.emission_tex = m["emissiveTexture"]["index"]
        if "metallicRoughnessTexture" in pbr:
            mat.roughness_tex = pbr["metallicRoughnessTexture"]["index"]
        if "normalTexture" in m:
            mat.normal_tex = m["normalTexture"]["index"]
        mat.ior = 1.5
        scene.materials.append(mat)

    # meshes -> one Shape per primitive
    mesh_prims: list[list[tuple[int, int]]] = []  # per mesh: (shape, material)
    for mesh in doc.get("meshes", []):
        prims = []
        for prim in mesh.get("primitives", []):
            if prim.get("mode", 4) != 4:
                continue  # triangles only, like the reference converter
            attrs = prim["attributes"]
            pos = _accessor(doc, buffers, attrs["POSITION"]).astype(np.float32)
            norm = (_accessor(doc, buffers, attrs["NORMAL"]).astype(np.float32)
                    if "NORMAL" in attrs else None)
            tc = (_accessor(doc, buffers, attrs["TEXCOORD_0"]).astype(np.float32)
                  if "TEXCOORD_0" in attrs else None)
            if "indices" in prim:
                idx = _accessor(doc, buffers, prim["indices"]).astype(np.int64)
            else:
                idx = np.arange(pos.shape[0], dtype=np.int64)
            tris = idx.reshape(-1, 3).astype(np.int32)
            shape = Shape(positions=pos, normals=norm, texcoords=tc,
                          triangles=tris)
            prims.append((len(scene.shapes), prim.get("material", -1)))
            scene.shapes.append(shape)
        mesh_prims.append(prims)

    # nodes -> flattened world transforms
    nodes = doc.get("nodes", [])
    roots = (doc.get("scenes", [{}])[doc.get("scene", 0)].get("nodes", [])
             if doc.get("scenes") else list(range(len(nodes))))

    def walk(idx, parent):
        node = nodes[idx]
        world = parent @ _node_matrix(node)
        frame = _mat_to_frame(world)
        if "mesh" in node:
            for shape_id, mat_id in mesh_prims[node["mesh"]]:
                scene.instances.append(Instance(
                    frame=frame, shape=shape_id, material=mat_id))
        if "camera" in node:
            cam = doc["cameras"][node["camera"]]
            if cam.get("type") == "perspective":
                p = cam.get("perspective", {})
                film = 0.036
                aspect = float(p.get("aspectRatio", 16 / 9))
                yfov = float(p.get("yfov", 0.8))
                lens = (film / aspect) / (2.0 * np.tan(yfov / 2.0))
                scene.cameras.append(Camera(
                    frame=frame, lens=float(lens), film=film, aspect=aspect,
                    focus=10.0))
        for ch in node.get("children", []):
            walk(ch, world)

    for r in roots:
        walk(r, np.eye(4, dtype=np.float32))

    from .sceneio import add_missing_camera, add_missing_material

    add_missing_material(scene)
    add_missing_camera(scene)
    return scene


def _decode_image(raw: bytes) -> np.ndarray:
    """PNG/JPEG bytes -> (H, W, 4) float32 in [0,1] (srgb-encoded)."""
    if raw[:8] == b"\x89PNG\r\n\x1a\n":
        img = image_io.decode_png(raw)
        scale = 65535.0 if img.dtype == np.uint16 else 255.0
        img = img.astype(np.float32) / scale
    else:
        from .jpeg import decode_jpeg

        img = decode_jpeg(raw).astype(np.float32) / 255.0
    if img.ndim == 2:
        img = img[..., None]
    c = img.shape[-1]
    if c == 1:
        img = np.repeat(img, 3, axis=-1)
        c = 3
    if c == 2:
        img = np.concatenate([np.repeat(img[..., :1], 3, -1), img[..., 1:]], -1)
        c = 4
    if c == 3:
        img = np.concatenate([img, np.ones_like(img[..., :1])], axis=-1)
    return img.astype(np.float32)
