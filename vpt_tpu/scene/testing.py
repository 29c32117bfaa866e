"""Procedural in-memory test scenes (no file IO) for tests, the graft entry
point, and benchmarks. Mirrors the shape of tests/03_volume: floor + spheres
with matte/refractive/volumetric materials + two area lights."""

from __future__ import annotations

import numpy as np

from .procedural import make_uvsphere
from .schema import (
    Camera, Environment, HostScene, Instance, Material, Sdf, Shape, Texture,
    VolInstance, VolumeGrid,
)


def _quad_shape(size=1.0, y=0.0):
    p = np.array(
        [[-size, y, size], [size, y, size], [-size, y, -size], [size, y, -size]],
        np.float32)
    return Shape(
        positions=p,
        normals=np.tile(np.array([[0, 1, 0]], np.float32), (4, 1)),
        texcoords=np.array([[0, 0], [1, 0], [0, 1], [1, 1]], np.float32),
        quads=np.array([[0, 1, 3, 2]], np.int32),
    )


def _frame(rows):
    return np.asarray(rows, np.float32).reshape(4, 3)


def make_test_scene(sphere_steps=12, with_volume=True) -> HostScene:
    s = HostScene()
    s.cameras.append(Camera(
        frame=_frame([0.8151804, -0.0, 0.5792072,
                      0.16660169, 0.95773935, -0.23447643,
                      -0.5547295, 0.2876375, 0.78073043,
                      -0.75, 0.4, 0.9]),
        lens=0.05, aspect=2.4, film=0.036, focus=1.2168, aperture=0.0))
    # checkerboard texture
    n = 64
    yy, xx = np.meshgrid(np.arange(n), np.arange(n), indexing="ij")
    checker = (((xx // 8) + (yy // 8)) % 2).astype(np.float32) * 0.5 + 0.4
    tex = np.stack([checker] * 3 + [np.ones_like(checker)], axis=-1)
    s.textures.append(Texture(width=n, height=n, linear=False, pixels=tex))

    s.materials.append(Material(  # 0: floor
        type=0, color=np.array([0.7, 0.7, 0.7], np.float32), color_tex=0))
    s.materials.append(Material(  # 1: glass
        type=4, color=np.array([1.0, 0.5, 0.5], np.float32), roughness=0.0,
        trdepth=0.02))
    s.materials.append(Material(  # 2: volumetric smoke (anisotropic like
        # 03_volume's cloud, scanisotropy -0.8 — keeps HG grads exercised)
        type=6, color=np.array([0.5, 0.5, 0.5], np.float32),
        scattering=np.array([0.2, 0.2, 0.2], np.float32),
        scanisotropy=-0.4))
    s.materials.append(Material(  # 3: matte red
        type=0, color=np.array([0.6, 0.2, 0.2], np.float32)))
    s.materials.append(Material(  # 4: arealight
        type=0, emission=np.array([20.0, 20.0, 20.0], np.float32)))

    s.shapes.append(_quad_shape(2.0))                         # 0 floor
    sph = make_uvsphere((sphere_steps * 2, sphere_steps), 0.075)
    s.shapes.append(Shape(**sph))                              # 1 sphere
    s.shapes.append(_quad_shape(0.1))                          # 2 light quad

    ident = _frame([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0])
    s.instances.append(Instance(frame=ident, shape=0, material=0))
    s.instances.append(Instance(
        frame=_frame([1, 0, 0, 0, 1, 0, 0, 0, 1, -0.25, 0.08, 0]),
        shape=1, material=1))
    if with_volume:
        s.instances.append(Instance(
            frame=_frame([1, 0, 0, 0, 1, 0, 0, 0, 1, 0.0, 0.08, 0]),
            shape=1, material=2))
    s.instances.append(Instance(
        frame=_frame([1, 0, 0, 0, 1, 0, 0, 0, 1, 0.25, 0.08, 0]),
        shape=1, material=3))
    s.instances.append(Instance(
        frame=_frame([0.894427, 0, 0.447213,
                      0.275624, 0.787499, -0.551249,
                      -0.352180, 0.616315, 0.704360,
                      -0.4, 0.8, 0.8]),
        shape=2, material=4))
    s.environments.append(Environment(
        frame=ident, emission=np.array([0.3, 0.3, 0.35], np.float32)))
    return s


def sphere_grid(dims=24, radius=0.3, scalef=1.0):
    """Voxel SDF grid of a sphere centered in the grid box, sampled on the
    exact lattice eval_volume_grid reads (voxel i at i/(n-1) of the box)."""
    n = dims
    res = 1.0 / n  # grid box spans [0, res*n*scalef] per axis
    box = res * n * scalef
    xs = np.arange(n, dtype=np.float32) / (n - 1) * box
    Z, Y, X = np.meshgrid(xs, xs, xs, indexing="ij")
    ctr = box / 2
    d = np.sqrt((X - ctr) ** 2 + (Y - ctr) ** 2 + (Z - ctr) ** 2) - radius
    # stored values are pre-scalef (eval multiplies by scalef)
    return VolumeGrid(
        whd=np.array([n, n, n], np.int32),
        values=(d / scalef).astype(np.float32), res=res), box


def make_sdf_test_scene(grid=True, analytic=True, light=True) -> HostScene:
    """Minimal implicit-shader scene: a grid-SDF sphere at the origin, an
    analytic SDF sphere beside it, an emissive SDF box light above, and a dim
    environment. Mirrors the structure of tests/07_sdfunction."""
    s = HostScene()
    s.cameras.append(Camera(
        frame=_frame([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0.1, 1.6]),
        lens=0.05, aspect=2.0, film=0.036, focus=1.6, aperture=0.0))
    s.materials.append(Material(  # 0: matte gray (grid sphere)
        type=0, color=np.array([0.7, 0.6, 0.5], np.float32)))
    s.materials.append(Material(  # 1: matte red (analytic sphere)
        type=0, color=np.array([0.7, 0.2, 0.2], np.float32)))
    s.materials.append(Material(  # 2: sdf light
        type=0, emission=np.array([10.0, 10.0, 10.0], np.float32),
        color=np.array([1.0, 1.0, 1.0], np.float32)))
    ident = _frame([1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 0])
    if grid:
        vol, box = sphere_grid(dims=24, radius=0.3)
        s.volumes.append(vol)
        # frames act world->local: translate world origin to grid-box center
        s.vol_instances.append(VolInstance(
            volume=0, material=0, scalef=1.0,
            frame=_frame([1, 0, 0, 0, 1, 0, 0, 0, 1, box / 2, box / 2, box / 2])))
    if analytic:
        # sphere radius 0.22 at world (0.6, 0, 0)
        s.sdfs.append(Sdf(
            type=4, params=np.array([0.22, 0, 0, 0], np.float32),
            whd=np.zeros(3, np.float32),
            frame=_frame([1, 0, 0, 0, 1, 0, 0, 0, 1, -0.6, 0, 0]),
            material=1))
    if light:
        # emissive box spanning world [-0.2,0.2]x[0.55,0.95]x[0.2,0.25];
        # rect light plane at local z = whd.z (lights.py KIND_SDF)
        whd = np.array([0.4, 0.4, 0.05], np.float32)
        s.sdfs.append(Sdf(
            type=1, params=np.array([0.4, 0.4, 0.05, 0], np.float32),
            whd=whd,
            frame=_frame([1, 0, 0, 0, 1, 0, 0, 0, 1, 0.2, -0.55, -0.2]),
            material=2))
    s.environments.append(Environment(
        frame=ident, emission=np.array([0.15, 0.15, 0.18], np.float32)))
    return s
