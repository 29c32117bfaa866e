"""Whole-scene import dispatch tests (load_scene: obj/ply/stl/gltf/pbrt).

Mirrors the reference's format converters (yocto_sceneio.cpp:2641-2706)."""

import os

import numpy as np
import pytest

from vpt_tpu.scene.sceneio import load_scene


def test_obj_scene_with_mtl(tmp_path):
    (tmp_path / "box.mtl").write_text(
        "newmtl red\nKd 0.8 0.1 0.1\n"
        "newmtl shiny\nKd 0.1 0.1 0.8\nKs 0.9 0.9 0.9\nNs 500\n"
        "newmtl glassy\nTf 0.9 0.9 0.9\nNi 1.5\n")
    (tmp_path / "box.obj").write_text(
        "mtllib box.mtl\n"
        "v 0 0 0\nv 1 0 0\nv 1 1 0\nv 0 1 0\n"
        "v 0 0 1\nv 1 0 1\nv 1 1 1\nv 0 1 1\n"
        "usemtl red\nf 1 2 3 4\n"
        "usemtl shiny\nf 5 6 7 8\n"
        "usemtl glassy\nf 1 2 6 5\n")
    scene = load_scene(str(tmp_path / "box.obj"))
    assert len(scene.shapes) == 3 and len(scene.instances) == 3
    assert len(scene.materials) == 3
    mats = [scene.materials[i.material] for i in scene.instances]
    assert mats[0].type == 0  # matte
    np.testing.assert_allclose(mats[0].color, [0.8, 0.1, 0.1])
    assert mats[1].type == 2  # specular > 0.2 -> reflective
    assert mats[2].type == 3  # transmission -> transparent
    # exponent 500 -> roughness (2/502)^(1/4)
    assert mats[1].roughness == pytest.approx((2 / 502) ** 0.25, rel=1e-5)
    assert len(scene.cameras) == 1  # add_missing_camera framed the bounds


def test_ply_scene_single_mesh():
    scene = load_scene("/root/reference/tests/01_surface/shapes/floor.ply")
    assert len(scene.shapes) == 1
    assert len(scene.materials) == 1 and len(scene.cameras) == 1
    assert scene.instances[0].material == 0


def test_stl_scene_roundtrip(tmp_path):
    from vpt_tpu.scene.stl import save_stl

    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    tris = np.asarray([[0, 1, 2]], np.int32)
    p = str(tmp_path / "tri.stl")
    save_stl(p, pos, tris)
    scene = load_scene(p)
    assert scene.shapes[0].triangles.shape == (1, 3)
    assert len(scene.cameras) == 1


def test_unknown_format_raises(tmp_path):
    p = tmp_path / "scene.xyz"
    p.write_text("")
    with pytest.raises(ValueError, match="unknown scene format"):
        load_scene(str(p))


def test_obj_scene_renders_end_to_end(tmp_path):
    from vpt_tpu.renderer import RenderParams, Renderer

    (tmp_path / "tri.obj").write_text(
        "v -1 0 -1\nv 1 0 -1\nv 0 0 1\nf 1 2 3\n")
    scene = load_scene(str(tmp_path / "tri.obj"))
    img, _ = Renderer(scene, RenderParams(
        shader="eyelight", samples=1, resolution=24, bounces=2),
        devices=1).render(samples=1, chunk=1)
    assert np.isfinite(img).all()


def test_gltf_scene_minimal(tmp_path):
    import base64
    import json as _json

    # one triangle, indexed, with a gltfpbr material and a TRS node
    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    idx = np.asarray([0, 1, 2], np.uint16)
    buf = pos.tobytes() + idx.tobytes() + b"\x00\x00"
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"uri": "data:application/octet-stream;base64,"
                            + base64.b64encode(buf).decode(),
                     "byteLength": len(buf)}],
        "bufferViews": [
            {"buffer": 0, "byteOffset": 0, "byteLength": 36},
            {"buffer": 0, "byteOffset": 36, "byteLength": 6},
        ],
        "accessors": [
            {"bufferView": 0, "componentType": 5126, "count": 3,
             "type": "VEC3"},
            {"bufferView": 1, "componentType": 5123, "count": 3,
             "type": "SCALAR"},
        ],
        "materials": [{"pbrMetallicRoughness": {
            "baseColorFactor": [0.9, 0.1, 0.1, 1.0],
            "metallicFactor": 0.3, "roughnessFactor": 0.4}}],
        "meshes": [{"primitives": [
            {"attributes": {"POSITION": 0}, "indices": 1, "material": 0}]}],
        "nodes": [{"mesh": 0, "translation": [0, 0, 2]}],
        "scenes": [{"nodes": [0]}],
        "scene": 0,
    }
    p = tmp_path / "tri.gltf"
    p.write_text(_json.dumps(doc))
    scene = load_scene(str(p))
    assert len(scene.shapes) == 1 and len(scene.instances) == 1
    assert scene.materials[0].type == 7  # gltfpbr
    np.testing.assert_allclose(scene.materials[0].color, [0.9, 0.1, 0.1])
    assert scene.materials[0].metallic == pytest.approx(0.3)
    np.testing.assert_allclose(scene.instances[0].frame[3], [0, 0, 2])
    assert scene.shapes[0].triangles.shape == (1, 3)
    assert len(scene.cameras) == 1


def test_glb_container(tmp_path):
    import json as _json
    import struct

    pos = np.asarray([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32)
    bin_chunk = pos.tobytes()
    doc = {
        "asset": {"version": "2.0"},
        "buffers": [{"byteLength": len(bin_chunk)}],
        "bufferViews": [{"buffer": 0, "byteOffset": 0,
                         "byteLength": len(bin_chunk)}],
        "accessors": [{"bufferView": 0, "componentType": 5126, "count": 3,
                       "type": "VEC3"}],
        "meshes": [{"primitives": [{"attributes": {"POSITION": 0}}]}],
        "nodes": [{"mesh": 0}],
        "scenes": [{"nodes": [0]}],
    }
    j = _json.dumps(doc).encode()
    j += b" " * ((-len(j)) % 4)
    b = bin_chunk + b"\x00" * ((-len(bin_chunk)) % 4)
    glb = (struct.pack("<III", 0x46546C67, 2, 12 + 8 + len(j) + 8 + len(b))
           + struct.pack("<II", len(j), 0x4E4F534A) + j
           + struct.pack("<II", len(b), 0x004E4942) + b)
    p = tmp_path / "tri.glb"
    p.write_bytes(glb)
    scene = load_scene(str(p))
    assert scene.shapes[0].positions.shape == (3, 3)
    assert scene.shapes[0].triangles.shape == (1, 3)


def test_pbrt_scene_subset(tmp_path):
    (tmp_path / "s.pbrt").write_text("""
LookAt 0 1 5  0 0 0  0 1 0
Camera "perspective" "float fov" [40]
Film "rgb" "integer xresolution" [640] "integer yresolution" [360]
WorldBegin
AttributeBegin
  AreaLightSource "diffuse" "rgb L" [10 10 10]
  Shape "trianglemesh" "point3 P" [-1 3 -1  1 3 -1  0 3 1]
        "integer indices" [0 1 2]
AttributeEnd
Material "matte" "rgb Kd" [0.6 0.2 0.2]
Shape "trianglemesh" "point3 P" [-5 0 -5  5 0 -5  0 0 5]
      "integer indices" [0 1 2]
AttributeBegin
  Translate 0 1 0
  Material "glass"
  Shape "sphere" "float radius" [0.5]
AttributeEnd
LightSource "infinite" "rgb L" [0.2 0.2 0.3]
""")
    scene = load_scene(str(tmp_path / "s.pbrt"))
    assert len(scene.cameras) == 1
    assert scene.cameras[0].aspect == pytest.approx(640 / 360)
    # light tri + floor + sphere
    assert len(scene.instances) == 3
    emissive = [scene.materials[i.material] for i in scene.instances
                if np.any(scene.materials[i.material].emission > 0)]
    assert len(emissive) == 1
    glass = scene.materials[scene.instances[2].material]
    assert glass.type == 4  # refractive
    np.testing.assert_allclose(scene.instances[2].frame[3], [0, 1, 0])
    assert len(scene.environments) == 1
    np.testing.assert_allclose(scene.environments[0].emission, [0.2, 0.2, 0.3])


def test_pbrt_scene_renders(tmp_path):
    from vpt_tpu.renderer import RenderParams, Renderer

    (tmp_path / "r.pbrt").write_text("""
LookAt 0 1 4  0 0.5 0  0 1 0
Camera "perspective" "float fov" [45]
WorldBegin
Material "matte" "rgb Kd" [0.7 0.7 0.7]
Shape "trianglemesh" "point3 P" [-5 0 -5  5 0 -5  0 0 5]
      "integer indices" [0 1 2]
LightSource "infinite" "rgb L" [0.6 0.6 0.6]
""")
    img, _ = Renderer(str(tmp_path / "r.pbrt"), RenderParams(
        shader="eyelight", samples=1, resolution=24, bounces=2),
        devices=1).render(samples=1, chunk=1)
    assert np.isfinite(img).all() and img[..., :3].max() > 0.01
