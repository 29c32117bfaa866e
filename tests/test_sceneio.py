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


def test_json_scene_save_load_roundtrip(tmp_path):
    """load -> save -> load must reproduce the same flattened scene
    (save_json_scene parity with yocto_sceneio.cpp:3868; shapes round-trip
    through our PLY writer, textures through PNG/HDR)."""
    import numpy as np

    from vpt_tpu.scene.flatten import flatten_scene
    from vpt_tpu.scene.json_io import load_json_scene
    from vpt_tpu.scene.json_save import save_json_scene

    s1 = load_json_scene("/root/reference/tests/03_volume/volume.json")
    out = tmp_path / "resaved" / "scene.json"
    out.parent.mkdir()
    save_json_scene(str(out), s1)
    s2 = load_json_scene(str(out))
    assert len(s2.shapes) == len(s1.shapes)
    assert len(s2.materials) == len(s1.materials)
    assert len(s2.textures) == len(s1.textures)
    a1 = flatten_scene(s1)
    a2 = flatten_scene(s2)
    assert np.allclose(a1.tri_pos, a2.tri_pos)
    assert np.array_equal(a1.mat_type, a2.mat_type)
    assert np.allclose(a1.mat_color, a2.mat_color, atol=1e-6)
    # HDR sky texture survives an RGBE re-encode to ~1% (shared-exponent
    # quantization); LDR PNGs round-trip exactly
    for t1, t2 in zip(s1.textures, s2.textures):
        assert t1.linear == t2.linear
        if t1.linear:
            denom = np.maximum(np.abs(t1.pixels[..., :3]), 1e-3)
            rel = np.abs(t1.pixels[..., :3] - t2.pixels[..., :3]) / denom
            assert rel.max() < 0.02
        else:
            assert np.allclose(t1.pixels, t2.pixels, atol=1 / 255 + 1e-6)


def test_save_shape_formats(tmp_path):
    import numpy as np

    from vpt_tpu.scene.json_save import save_shape
    from vpt_tpu.scene.ply import load_ply
    from vpt_tpu.scene.obj import load_obj_shape
    from vpt_tpu.scene.stl import load_stl

    r = np.random.RandomState(0)
    shape = {
        "positions": r.rand(12, 3).astype(np.float32),
        "normals": r.rand(12, 3).astype(np.float32),
        "texcoords": r.rand(12, 2).astype(np.float32),
        "triangles": r.randint(0, 12, (7, 3)).astype(np.int32),
        "quads": None, "colors": None, "radius": None,
    }
    save_shape(str(tmp_path / "s.ply"), shape)
    back = load_ply(str(tmp_path / "s.ply"))
    assert np.allclose(back["positions"], shape["positions"])
    assert np.allclose(back["normals"], shape["normals"])
    assert np.allclose(back["texcoords"], shape["texcoords"])
    assert np.array_equal(back["triangles"], shape["triangles"])

    save_shape(str(tmp_path / "s.obj"), shape)
    back = load_obj_shape(str(tmp_path / "s.obj"))
    # OBJ round-trips through a face-varying split (degenerate quads),
    # so compare the corner geometry, not the indexing
    if back.get("quads") is not None:
        faces = back["positions"][back["quads"][:, :3]]
    else:
        faces = back["positions"][back["triangles"]]
    want = shape["positions"][shape["triangles"]]
    order = np.lexsort(faces.reshape(7, -1).T)
    worder = np.lexsort(want.reshape(7, -1).T)
    assert np.allclose(faces[order], want[worder], atol=1e-6)

    save_shape(str(tmp_path / "s.stl"), shape)
    back = load_stl(str(tmp_path / "s.stl"))
    assert back["triangles"].shape[0] == 7


def test_save_shape_lines_points_roundtrip(tmp_path):
    import numpy as np

    from vpt_tpu.scene.json_save import save_shape
    from vpt_tpu.scene.ply import load_ply

    r = np.random.RandomState(1)
    shape = {
        "positions": r.rand(10, 3).astype(np.float32),
        "radius": np.full(10, 0.01, np.float32),
        "lines": np.array([[0, 1], [1, 2], [5, 6]], np.int32),
        "points": np.array([7, 8, 9], np.int32),
    }
    save_shape(str(tmp_path / "l.ply"), shape)
    back = load_ply(str(tmp_path / "l.ply"))
    assert np.array_equal(back["lines"], shape["lines"])
    assert np.array_equal(back["points"], shape["points"])
    assert np.allclose(back["radius"], shape["radius"])


def _write_minimal_assets(d):
    import numpy as np

    from vpt_tpu.scene import image_io
    from vpt_tpu.scene.ply import save_ply

    (d / "shapes").mkdir(parents=True, exist_ok=True)
    (d / "textures").mkdir(parents=True, exist_ok=True)
    tri = {
        "positions": np.array(
            [[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        "triangles": np.array([[0, 1, 2]], np.int32),
    }
    save_ply(str(d / "shapes" / "tri.ply"), tri)
    image_io.save_png(str(d / "textures" / "tex.png"),
                      np.full((4, 4, 4), 0.5, np.float32))


def test_legacy_json_40(tmp_path):
    """No-version JSON: name-keyed groups, string refs, legacy material
    names (metallic->reflective, volume->volumetric), lookat frames
    (yocto_sceneio.cpp load_json_scene_version40)."""
    import json

    import numpy as np

    from vpt_tpu.scene.json_io import load_json_scene
    from vpt_tpu.scene.schema import MATERIAL_TYPES

    _write_minimal_assets(tmp_path)
    doc = {
        "cameras": {"cam": {"lookat": [[0, 0, 5], [0, 0, 0], [0, 1, 0]]}},
        "materials": {
            "metal": {"type": "metallic", "color": [0.7, 0.7, 0.7]},
            "smoke": {"type": "volume", "color": [0.5, 0.5, 0.5]},
        },
        "instances": {
            "obj1": {"shape": "tri", "material": "metal"},
            "obj2": {"shape": "tri", "material": "smoke",
                     "frame": [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 2, 0]},
        },
        "environments": {"env": {"emission": [1, 1, 1],
                                 "emission_tex": "tex"}},
    }
    (tmp_path / "scene.json").write_text(json.dumps(doc))
    s = load_json_scene(str(tmp_path / "scene.json"))
    assert len(s.cameras) == 1
    assert abs(s.cameras[0].focus - 5.0) < 1e-6
    assert MATERIAL_TYPES[s.materials[0].type] == "reflective"
    assert MATERIAL_TYPES[s.materials[1].type] == "volumetric"
    assert len(s.instances) == 2
    assert s.instances[0].shape == s.instances[1].shape  # shared by name
    assert np.allclose(s.instances[1].frame[3], [0, 2, 0])
    assert s.environments[0].emission_tex == 0
    assert s.textures[0].width == 4
    assert s.shapes[0].triangles.shape == (1, 3)


def test_legacy_json_41(tmp_path):
    import json

    from vpt_tpu.scene.json_io import load_json_scene
    from vpt_tpu.scene.schema import MATERIAL_TYPES

    _write_minimal_assets(tmp_path)
    doc = {
        "asset": {"version": "4.1"},
        "cameras": {"cam": {"lens": 0.1}},
        "textures": {"tex": {"datafile": "textures/tex.png"}},
        "materials": {
            "m": {"type": "reflective", "color": [1, 1, 1],
                  "color_tex": "tex"},
        },
        "shapes": {"tri": {"datafile": "shapes/tri.ply"}},
        "instances": {"i": {"shape": "tri", "material": "m"}},
    }
    (tmp_path / "scene.json").write_text(json.dumps(doc))
    s = load_json_scene(str(tmp_path / "scene.json"))
    assert MATERIAL_TYPES[s.materials[0].type] == "reflective"
    assert s.materials[0].color_tex == 0
    assert s.cameras[0].lens == 0.1
    assert s.shapes[0].positions.shape == (3, 3)


def test_legacy_json_40_ply_instances(tmp_path):
    """PLY instance replication: an 'instance' element with xx..oz frames
    multiplies the referencing instance (yocto_sceneio.cpp:3245-3280)."""
    import json

    import numpy as np

    from vpt_tpu.scene.json_io import load_json_scene

    _write_minimal_assets(tmp_path)
    (tmp_path / "instances").mkdir()
    frames = np.zeros((3, 12), np.float32)
    frames[:, [0, 4, 8]] = 1.0  # identity rotations
    frames[:, 9] = [0.0, 1.0, 2.0]  # ox offsets
    names = ["xx", "xy", "xz", "yx", "yy", "yz", "zx", "zy", "zz",
             "ox", "oy", "oz"]
    hdr = ["ply", "format binary_little_endian 1.0", "element instance 3"]
    hdr += [f"property float {n}" for n in names] + ["end_header", ""]
    with open(tmp_path / "instances" / "grid.ply", "wb") as f:
        f.write("\n".join(hdr).encode() + frames.astype("<f4").tobytes())
    doc = {
        "materials": {"m": {"type": "matte", "color": [1, 0, 0]}},
        "objects": {"o": {"shape": "tri", "material": "m",
                          "instance": "grid"}},
    }
    (tmp_path / "scene.json").write_text(json.dumps(doc))
    s = load_json_scene(str(tmp_path / "scene.json"))
    assert len(s.instances) == 3
    assert np.allclose([i.frame[3][0] for i in s.instances], [0, 1, 2])


def test_jpeg_texture_load(tmp_path):
    import numpy as np

    from vpt_tpu.scene.image_io import load_image
    from vpt_tpu.scene.jpeg import save_jpeg

    img = np.zeros((16, 24, 3), np.uint8)
    img[:, :12] = [200, 50, 30]
    img[:, 12:] = [20, 180, 240]
    save_jpeg(str(tmp_path / "t.jpg"), img, quality=95)
    px, linear = load_image(str(tmp_path / "t.jpg"))
    assert px.shape == (16, 24, 4) and not linear
    assert np.abs(px[:, :6, :3] * 255 - img[:, :6]).mean() < 6.0


def test_tga_bmp_texture_load(tmp_path):
    import numpy as np

    from vpt_tpu.scene import image_io

    r = np.random.RandomState(0)
    img = r.rand(9, 13, 4).astype(np.float32)
    u8 = (np.clip(img, 0, 1) * 255 + 0.5).astype(np.uint8)
    image_io.save_tga(str(tmp_path / "t.tga"), img)
    px, linear = image_io.load_image(str(tmp_path / "t.tga"))
    assert not linear and np.allclose(px * 255, u8, atol=0.51)
    image_io.save_bmp(str(tmp_path / "t.bmp"), img)
    px, linear = image_io.load_image(str(tmp_path / "t.bmp"))
    assert not linear
    assert np.allclose(px[..., :3] * 255, u8[..., :3], atol=0.51)


def test_obj_scene_save_load_roundtrip(tmp_path):
    """save_obj_scene (yocto_sceneio.cpp:2641 parity): whole scene to
    .obj+.mtl with instance frames baked; loading it back reproduces the
    material classes and world-space geometry."""
    import numpy as np

    from vpt_tpu.scene.json_save import save_obj_scene
    from vpt_tpu.scene.sceneio import load_obj_scene
    from vpt_tpu.scene.schema import (
        Camera, HostScene, Instance, Material, Shape, MATERIAL_TYPES,
    )

    s = HostScene()
    ID = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)
    tri = Shape(positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]],
                                   np.float32),
                normals=np.tile(np.float32([0, 0, 1]), (3, 1)),
                texcoords=np.array([[0, 0], [1, 0], [0, 1]], np.float32),
                triangles=np.array([[0, 1, 2]], np.int32), name="tri")
    s.shapes.append(tri)
    s.materials.append(Material(type=0, color=np.float32([0.6, 0.5, 0.4]),
                                roughness=0.5, name="paint"))
    s.materials.append(Material(type=2, color=np.float32([0.9, 0.9, 0.9]),
                                roughness=0.1, name="mirror"))
    fr = ID.copy()
    fr[3] = [2, 0, 0]
    s.instances.append(Instance(frame=ID, shape=0, material=0, name="a"))
    s.instances.append(Instance(frame=fr, shape=0, material=1, name="b"))
    out = tmp_path / "scene.obj"
    save_obj_scene(str(out), s)
    back = load_obj_scene(str(out))
    assert len(back.instances) >= 1
    # world-space geometry preserved: the second instance's triangle is
    # translated by +2 in x
    allpos = np.concatenate([back.shapes[i.shape].positions
                             for i in back.instances])
    assert allpos[:, 0].max() > 2.9  # 1 + 2 offset
    types = {MATERIAL_TYPES[m.type] for m in back.materials}
    assert "reflective" in types


def test_gltf_scene_save_load_roundtrip(tmp_path):
    """save_gltf_scene (yocto_sceneio.cpp:2659 parity) round-trips through
    our glTF importer: geometry, instance frame, pbr material."""
    import numpy as np

    from vpt_tpu.scene.json_save import save_gltf_scene
    from vpt_tpu.scene.gltf import load_gltf_scene
    from vpt_tpu.scene.schema import HostScene, Instance, Material, Shape

    s = HostScene()
    ID = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)
    fr = ID.copy()
    fr[3] = [0, 0, 2]
    s.shapes.append(Shape(
        positions=np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0]], np.float32),
        normals=np.tile(np.float32([0, 0, 1]), (3, 1)),
        triangles=np.array([[0, 1, 2]], np.int32), name="tri"))
    s.materials.append(Material(type=7, color=np.float32([0.9, 0.1, 0.1]),
                                metallic=0.3, roughness=0.4, opacity=1.0))
    s.instances.append(Instance(frame=fr, shape=0, material=0))
    out = tmp_path / "scene.gltf"
    save_gltf_scene(str(out), s)
    back = load_gltf_scene(str(out))
    assert back.shapes[0].triangles.shape == (1, 3)
    np.testing.assert_allclose(back.instances[0].frame[3], [0, 0, 2],
                               atol=1e-6)
    np.testing.assert_allclose(back.materials[0].color, [0.9, 0.1, 0.1],
                               atol=1e-6)
    assert back.materials[0].metallic == pytest.approx(0.3)


def test_pbrt_scene_save_load_roundtrip(tmp_path):
    """save_pbrt_scene stays within the subset scene/pbrt.py parses."""
    import numpy as np

    from vpt_tpu.scene.json_save import save_pbrt_scene
    from vpt_tpu.scene.pbrt import load_pbrt_scene
    from vpt_tpu.scene.schema import (
        Camera, Environment, HostScene, Instance, Material, Shape,
    )

    s = HostScene()
    ID = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)
    cam = ID.copy()
    cam[3] = [0, 1, 5]
    s.cameras.append(Camera(frame=cam, lens=0.05, aspect=2.0))
    s.environments.append(Environment(
        frame=ID, emission=np.float32([0.2, 0.2, 0.3])))
    s.shapes.append(Shape(
        positions=np.array([[-5, 0, -5], [5, 0, -5], [0, 0, 5]], np.float32),
        triangles=np.array([[0, 1, 2]], np.int32)))
    s.materials.append(Material(type=0, color=np.float32([0.6, 0.2, 0.2])))
    s.materials.append(Material(type=0, emission=np.float32([10, 10, 10])))
    s.instances.append(Instance(frame=ID, shape=0, material=0))
    fr = ID.copy()
    fr[3] = [0, 3, 0]
    s.instances.append(Instance(frame=fr, shape=0, material=1))
    out = tmp_path / "scene.pbrt"
    save_pbrt_scene(str(out), s)
    back = load_pbrt_scene(str(out))
    assert len(back.instances) == 2
    assert len(back.environments) == 1
    emissive = [back.materials[i.material] for i in back.instances
                if np.any(back.materials[i.material].emission > 0)]
    assert len(emissive) == 1
    # baked frame: second instance's triangle translated by +3 in y
    pos2 = back.shapes[back.instances[1].shape].positions
    assert pos2[:, 1].min() >= 2.9


def test_scene_stats_and_validation():
    """scene_stats/scene_validation parity (yocto_scene.h:389-392 — present
    in the reference library, surfaced by our CLI --stats/--validate)."""
    import numpy as np

    from vpt_tpu.scene.json_io import load_json_scene
    from vpt_tpu.scene.stats import scene_stats, scene_validation

    s = load_json_scene("/root/reference/tests/03_volume/volume.json")
    stats = scene_stats(s)
    d = {line.split(":")[0]: line.split(":")[1].strip() for line in stats}
    assert int(d["cameras"].replace(",", "")) == 1
    assert int(d["instances"].replace(",", "")) == len(s.instances)
    prims = (int(d["triangles"].replace(",", ""))
             + int(d["quads"].replace(",", "")))
    assert prims > 0  # 03's shapes are quad meshes
    assert int(d["memory"].replace(",", "")) > 1000
    assert scene_validation(s) == []

    # duplicate + dangling refs are reported
    s.materials[0].name = s.materials[1].name = "dup"
    s.instances[0].shape = 999
    errs = scene_validation(s)
    assert any("duplicated material" in e for e in errs)
    assert any("invalid shape" in e for e in errs)
