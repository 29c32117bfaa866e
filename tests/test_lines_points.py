"""Line/point primitive support: intersections vs closed forms
(yocto_geometry.h:683-747), shading semantics (yocto_scene.cpp:460-503),
flatten path, and an end-to-end render with mixed primitives."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.ops.bvh import intersect_scene, set_traversal_backend
from vpt_tpu.render import sceneval as SE
from vpt_tpu.scene.flatten import flatten_scene
from vpt_tpu.scene.schema import Camera, HostScene, Instance, Material, Shape

_CACHE = {}


def _scene():
    if "ds" in _CACHE:
        return _CACHE["ds"]
    s = HostScene()
    s.cameras.append(Camera(
        frame=np.asarray([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0.5, 3], np.float32
                         ).reshape(4, 3),
        lens=0.05, aspect=1.0, film=0.036, focus=3.0))
    s.materials.append(Material(type=0, color=np.asarray([0.8, 0.2, 0.2],
                                                         np.float32)))
    s.materials.append(Material(type=0, color=np.asarray([0.2, 0.8, 0.2],
                                                         np.float32)))
    s.materials.append(Material(type=0, color=np.asarray([0.2, 0.2, 0.8],
                                                         np.float32)))
    # floor triangle (material 0)
    s.shapes.append(Shape(
        positions=np.asarray([[-5, 0, -5], [5, 0, -5], [0, 0, 5]], np.float32),
        triangles=np.asarray([[0, 1, 2]], np.int32)))
    # vertical line segment, radius 0.1 (material 1)
    s.shapes.append(Shape(
        positions=np.asarray([[0, 0, 0], [0, 1, 0]], np.float32),
        radius=np.asarray([0.1, 0.1], np.float32),
        lines=np.asarray([[0, 1]], np.int32)))
    # point at (1, 0.5, 0), radius 0.2 (material 2)
    s.shapes.append(Shape(
        positions=np.asarray([[1, 0.5, 0]], np.float32),
        radius=np.asarray([0.2], np.float32),
        points=np.asarray([0], np.int32)))
    ident = np.asarray([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0],
                       np.float32).reshape(4, 3)
    for i in range(3):
        s.instances.append(Instance(frame=ident, shape=i, material=i))
    sa = flatten_scene(s)
    _CACHE["ds"] = (jax.tree.map(jnp.asarray, sa), s)
    return _CACHE["ds"]


def test_flatten_collects_line_point_tables():
    ds, _ = _scene()
    assert ds.line_p.shape == (1, 2, 3)
    assert ds.point_p.shape == (1, 3)
    assert int(ds.line_mat[0]) == 1 and int(ds.point_mat[0]) == 2


def test_intersect_scene_merges_line_point_hits():
    ds, _ = _scene()
    o = jnp.asarray([
        [0.0, 0.5, 3.0],   # line: closest approach at z=0, radius 0.1
        [1.0, 0.5, 3.0],   # point: disk test at t=3
        [-2.0, 0.01, 3.0],  # floor only (grazing above)
        [4.0, 4.0, 3.0],   # miss everything
    ])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (4, 1))
    isect = intersect_scene(ds, o, d)
    hit = np.asarray(isect["hit"])
    kind = np.asarray(isect["kind"])
    dist = np.asarray(isect["dist"])
    assert hit[0] and kind[0] == 1
    # ray-segment closest approach: t at min distance to the axis is z=3
    assert dist[0] == pytest.approx(3.0, abs=1e-5)
    assert np.asarray(isect["uv"])[0, 0] == pytest.approx(0.5, abs=1e-5)
    assert hit[1] and kind[1] == 2
    assert dist[1] == pytest.approx(3.0, abs=1e-5)
    assert not hit[3]


def test_line_point_shading_semantics():
    ds, _ = _scene()
    o = jnp.asarray([[0.0, 0.5, 3.0], [1.0, 0.5, 3.0]])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (2, 1))
    isect = intersect_scene(ds, o, d)
    outgoing = -d
    n = np.asarray(SE.eval_hit_shading_normal(ds, isect, outgoing))
    # line without vertex normals: tangent (0,1,0); shading normal =
    # orthonormalize(outgoing, tangent) = +z
    np.testing.assert_allclose(n[0], [0, 0, 1], atol=1e-5)
    # point sphere-hack normal at uv=(0,0): instance frame z axis
    np.testing.assert_allclose(n[1], [0, 0, 1], atol=1e-5)
    mat = SE.eval_hit_material(ds, isect)
    col = np.asarray(mat.color)
    np.testing.assert_allclose(col[0], [0.2, 0.8, 0.2], atol=1e-5)
    np.testing.assert_allclose(col[1], [0.2, 0.2, 0.8], atol=1e-5)
    pos = np.asarray(SE.eval_hit_position(ds, isect, o, d))
    np.testing.assert_allclose(pos[0], [0, 0.5, 0], atol=1e-4)
    np.testing.assert_allclose(pos[1], [1, 0.5, 0], atol=1e-4)


def test_line_closer_triangle_wins():
    """A triangle in front of the line must still win the min-t merge."""
    ds, _ = _scene()
    # ray through the line axis but the floor is NOT in the way; fire from
    # below the floor upward at the line -> floor (y=0) hit first
    o = jnp.asarray([[0.0, -1.0, 0.0]])
    d = jnp.asarray([[0.0, 1.0, 0.0]])
    isect = intersect_scene(ds, o, d)
    assert bool(isect["hit"][0])
    assert int(isect["kind"][0]) == 0  # triangle
    assert float(isect["dist"][0]) == pytest.approx(1.0, abs=1e-5)


def test_end_to_end_render_with_lines_points():
    from vpt_tpu.renderer import RenderParams, Renderer

    _, scene = _scene()
    params = RenderParams(shader="eyelight", samples=2, resolution=32,
                          bounces=2)
    img, _ = Renderer(scene, params, devices=1).render(samples=2, chunk=2)
    assert np.all(np.isfinite(img))
    assert img[..., :3].max() > 0.01


def test_obj_lines_points_roundtrip(tmp_path):
    from vpt_tpu.scene.obj import load_obj_shape

    p = tmp_path / "wire.obj"
    p.write_text(
        "v 0 0 0\nv 0 1 0\nv 1 0 0\nv 1 1 0\n"
        "l 1 2\nl 2 4\np 3\n")
    sh = load_obj_shape(str(p))
    assert sh["lines"].shape == (2, 2)
    assert sh["points"].shape == (1,)
    np.testing.assert_allclose(
        sh["positions"][sh["points"][0]], [1, 0, 0])
