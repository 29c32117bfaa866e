"""SDF subsystem tests: analytic primitives vs closed forms / independent
numpy oracles, grid trilinear vs a numpy re-evaluation, sphere-trace hit
parity on known geometry, FD normals, sdfgen sign correctness, SDF-light pdf,
and an end-to-end implicit render smoke test.

Covers ops/sdf.py + render/implicit.py (reference: yocto_sdfs.{h,cpp},
spheretrace yocto_pathtrace.cpp:259-307, shade_implicit :425-535)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.ops import sdf as S
from vpt_tpu.render.lights import build_lights_static, sample_lights_pdf
from vpt_tpu.scene.flatten import flatten_scene
from vpt_tpu.scene.testing import make_sdf_test_scene, sphere_grid

_CACHE = {}


def _ds():
    if "ds" not in _CACHE:
        scene = make_sdf_test_scene()
        arrays = flatten_scene(scene)
        _CACHE["ds"] = (jax.tree.map(jnp.asarray, arrays),
                        build_lights_static(arrays), scene)
    return _CACHE["ds"]


# ---------------------------------------------------------------------------
# analytic primitives
# ---------------------------------------------------------------------------

def test_sd_sphere_box_plane_torus_closed_form():
    p = jnp.asarray([[0.0, 0.0, 2.0], [0.3, 0.0, 0.0], [0.0, -0.5, 0.0]])
    np.testing.assert_allclose(
        np.asarray(S.sd_sphere(p, 0.5)), [1.5, -0.2, 0.0], atol=1e-6)
    np.testing.assert_allclose(
        np.asarray(S.sd_plane(p)), [0.0, 0.0, -0.5], atol=1e-6)
    b = jnp.asarray([1.0, 1.0, 1.0])
    pb = jnp.asarray([[2.0, 0.0, 0.0], [0.0, 0.0, 0.0], [2.0, 2.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(S.sd_box(pb, b)), [1.0, -1.0, np.sqrt(2.0)], atol=1e-6)
    pt = jnp.asarray([[1.0, 0.0, 0.0], [2.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    np.testing.assert_allclose(
        np.asarray(S.sd_torus(pt, 1.0, 0.25)),
        [-0.25, 0.75, np.sqrt(2.0) - 0.25], atol=1e-6)


def _np_sd_bbox(p, b, e):
    """Scalar numpy transcription of iq's sdBoxFrame (yocto_sdfs.h sd_bbox)."""
    p = np.abs(p) - b
    q = np.abs(p + e) - e

    def term(a, bb, c):
        v = np.maximum(np.array([a, bb, c]), 0.0)
        return np.linalg.norm(v) + min(max(a, bb, c), 0.0)

    return min(term(p[0], q[1], q[2]), term(q[0], p[1], q[2]),
               term(q[0], q[1], p[2]))


def _np_sd_capped_cone(p, h, r1, r2):
    qx = np.hypot(p[0], p[2])
    qy = p[1]
    k1 = np.array([r2, h])
    k2 = np.array([r2 - r1, 2.0 * h])
    ca = np.array([qx - min(qx, r1 if qy < 0 else r2), abs(qy) - h])
    q = np.array([qx, qy])
    tt = np.clip(np.dot(k1 - q, k2) / max(np.dot(k2, k2), 1e-30), 0.0, 1.0)
    cb = q - k1 + k2 * tt
    s = -1.0 if (cb[0] < 0 and ca[1] < 0) else 1.0
    return s * np.sqrt(min(np.dot(ca, ca), np.dot(cb, cb)))


def test_sd_bbox_capped_cone_vs_numpy_oracle():
    rng = np.random.default_rng(7)
    pts = rng.uniform(-2.5, 2.5, (64, 3)).astype(np.float32)
    want_bbox = [_np_sd_bbox(p, np.array([1.0, 0.8, 0.6]), 0.1) for p in pts]
    got_bbox = np.asarray(S.sd_bbox(
        jnp.asarray(pts), jnp.asarray([1.0, 0.8, 0.6]), 0.1))
    np.testing.assert_allclose(got_bbox, want_bbox, atol=1e-5)
    want_cc = [_np_sd_capped_cone(p, 0.7, 0.5, 0.2) for p in pts]
    got_cc = np.asarray(S.sd_capped_cone(jnp.asarray(pts), 0.7, 0.5, 0.2))
    np.testing.assert_allclose(got_cc, want_cc, atol=1e-5)
    # corner of the frame box is on the surface
    assert abs(float(S.sd_bbox(
        jnp.asarray([[1.0, 0.8, 0.6]]), jnp.asarray([1.0, 0.8, 0.6]), 0.1)[0])
    ) < 1e-6


def test_csg_ops():
    d1, d2 = jnp.asarray(0.5), jnp.asarray(-0.2)
    assert float(S.op_union(d1, d2)) == pytest.approx(-0.2)
    assert float(S.op_subtraction(d2, d1)) == pytest.approx(0.5)  # max(-d1, d2)
    assert float(S.op_intersection(d1, d2)) == pytest.approx(0.5)


def test_eval_analytic_dispatch():
    p = jnp.asarray([[0.0, 0.0, 2.0]])
    params = jnp.asarray([0.5, 0.0, 0.0, 0.0])
    d = S.eval_analytic(jnp.int32(S.SD_SPHERE), params, p)
    np.testing.assert_allclose(np.asarray(d), [1.5], atol=1e-6)
    # box lambda offsets by whd/2 (yocto_sceneio.cpp:3694-3701)
    params = jnp.asarray([1.0, 1.0, 1.0, 0.0])
    d = S.eval_analytic(jnp.int32(S.SD_BOX), params, jnp.asarray([[0.5, 0.5, 0.5]]))
    np.testing.assert_allclose(np.asarray(d), [-0.5], atol=1e-6)


# ---------------------------------------------------------------------------
# grid SDF
# ---------------------------------------------------------------------------

def test_grid_trilinear_matches_numpy():
    rng = np.random.default_rng(3)
    D, H, W = 5, 6, 7
    vals = rng.normal(size=(D, H, W)).astype(np.float32)
    uvw = rng.uniform(-1, 1, (40, 3)).astype(np.float32)
    got = np.asarray(S.eval_volume_grid(
        jnp.asarray(vals), jnp.asarray([W, H, D], jnp.int32), jnp.asarray(uvw)))

    def tri_np(u):
        s = (u[0] + 1) / 2 * (W - 1)
        t = (u[1] + 1) / 2 * (H - 1)
        r = (u[2] + 1) / 2 * (D - 1)
        i, j, k = int(s), int(t), int(r)
        ii, jj, kk = min(i + 1, W - 1), min(j + 1, H - 1), min(k + 1, D - 1)
        fu, fv, fw = s - i, t - j, r - k
        out = 0.0
        for (kz, wz) in ((k, 1 - fw), (kk, fw)):
            for (jy, wy) in ((j, 1 - fv), (jj, fv)):
                for (ix, wx) in ((i, 1 - fu), (ii, fu)):
                    out += vals[kz, jy, ix] * wz * wy * wx
        return out

    want = np.array([tri_np(u) for u in uvw], np.float32)
    np.testing.assert_allclose(got, want, rtol=1e-4, atol=1e-5)


def test_grid_sdf_sphere_parity():
    vol, box = sphere_grid(dims=32, radius=0.3, scalef=1.0)
    vals = jnp.asarray(vol.values)
    whd = jnp.asarray(vol.whd)
    # points inside the grid box (local coords), away from the box boundary
    rng = np.random.default_rng(1)
    p = rng.uniform(0.15 * box, 0.85 * box, (50, 3)).astype(np.float32)
    t = jnp.ones(50)
    d = np.asarray(S.eval_grid_sdf(vals, whd, jnp.float32(vol.res), 1.0,
                                   jnp.asarray(p), t))
    ctr = box / 2
    want = np.linalg.norm(p - ctr, axis=-1) - 0.3
    np.testing.assert_allclose(d, want, atol=0.01)  # trilinear error bound


def test_grid_sdf_outside_box_returns_box_distance():
    vol, box = sphere_grid(dims=16, radius=0.3)
    p = jnp.asarray([[box / 2, box / 2, box + 0.5]])
    d = float(S.eval_grid_sdf(
        jnp.asarray(vol.values), jnp.asarray(vol.whd),
        jnp.float32(vol.res), 1.0, p, jnp.ones(1))[0])
    assert abs(d - 0.5) < 1e-5


# ---------------------------------------------------------------------------
# scene eval + sphere tracing + normals
# ---------------------------------------------------------------------------

def test_eval_sdf_scene_picks_min():
    ds, _, _ = _ds()
    # at world (+0.6, 0, 0) the analytic sphere (radius .22) is the min
    # (frames act world->local: local = world + o, o = (-0.6, 0, 0))
    p = jnp.asarray([[0.6, 0.0, 0.0], [0.0, 0.0, 0.0]])
    d, kind, idx = S.eval_sdf_scene(ds, p, jnp.ones(2))
    assert float(d[0]) == pytest.approx(-0.22, abs=1e-5)
    assert int(kind[0]) == 1  # analytic
    # trilinear at the box center interpolates diagonal lattice corners, so
    # the value undershoots -radius; deep-inside sign is what matters
    assert float(d[1]) < -0.2
    assert int(kind[1]) == 0  # grid


def test_spheretrace_hit_and_miss():
    ds, _, _ = _ds()
    o = jnp.asarray([[0.0, 0.0, 1.5], [0.6, 0.0, 1.5], [5.0, 5.0, 1.5]])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (3, 1))
    hit, t, kind, idx = S.spheretrace(ds, o, d, 256)
    assert bool(hit[0]) and bool(hit[1]) and not bool(hit[2])
    assert float(t[0]) == pytest.approx(1.2, abs=0.02)   # grid sphere r=.3
    assert float(t[1]) == pytest.approx(1.28, abs=0.01)  # analytic r=.22
    assert int(kind[0]) == 0 and int(kind[1]) == 1


def test_spheretrace_single_sdf_variant():
    ds, _, _ = _ds()
    # restrict to analytic sphere (sdf index 0): ray at grid sphere misses
    o = jnp.asarray([[0.0, 0.0, 1.5], [0.6, 0.0, 1.5]])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (2, 1))
    hit, t, _, _ = S.spheretrace(ds, o, d, 256, sdf_id=0)
    assert not bool(hit[0]) and bool(hit[1])


def test_sdf_normal_radial_on_sphere():
    ds, _, _ = _ds()
    o = jnp.asarray([[0.6 + 0.9, 0.35, 0.9]])
    # fire at the analytic sphere center from a known direction
    ctr = jnp.asarray([0.6, 0.0, 0.0])
    d = (ctr - o) / jnp.linalg.norm(ctr - o)
    hit, t, _, _ = S.spheretrace(ds, o, d, 256)
    assert bool(hit[0])
    p = o + d * t[..., None]
    n = np.asarray(S.eval_sdf_normal(ds, p, t))[0]
    want = np.asarray((p[0] - ctr) / jnp.linalg.norm(p[0] - ctr))
    assert float(np.dot(n, want)) > 0.995


def test_reattach_t_value_equals_detached():
    ds, _, _ = _ds()
    o = jnp.asarray([[0.0, 0.0, 1.5]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])
    hit, t, _, _ = S.spheretrace(ds, o, d, 256)
    t_re = S.reattach_t(ds, o, d, t, hit)
    np.testing.assert_allclose(np.asarray(t_re), np.asarray(t), rtol=1e-5)


def test_reattach_t_gradient_sign():
    """Growing the analytic sphere radius moves the hit closer: dt/dr = -1
    exactly for a head-on ray at a sphere."""
    ds, _, _ = _ds()
    o = jnp.asarray([[0.6, 0.0, 1.5]])
    d = jnp.asarray([[0.0, 0.0, -1.0]])

    def t_of_radius(r):
        params = ds.sdf_params.at[0, 0].set(r)
        ds_r = ds._replace(sdf_params=params)
        hit, t_det, _, _ = S.spheretrace(ds_r, o, d, 256)
        return jnp.sum(S.reattach_t(ds_r, o, d, t_det, hit))

    g = float(jax.grad(t_of_radius)(jnp.float32(0.22)))
    assert g == pytest.approx(-1.0, rel=0.05)


# ---------------------------------------------------------------------------
# sdfgen (mesh -> signed grid)
# ---------------------------------------------------------------------------

def test_sdfgen_sign_and_distance_on_cube():
    from vpt_tpu.scene.sdfgen import mesh_to_sdf

    # unit cube [0,1]^3 as 12 triangles
    v = np.array([[x, y, z] for z in (0, 1) for y in (0, 1) for x in (0, 1)],
                 np.float32)
    quads = [(0, 1, 3, 2), (4, 6, 7, 5), (0, 4, 5, 1), (2, 3, 7, 6),
             (0, 2, 6, 4), (1, 5, 7, 3)]
    tris = []
    for (a, b, c, d) in quads:
        tris += [(a, b, c), (a, c, d)]
    whd, values, res, lo = mesh_to_sdf(v, np.asarray(tris), dims=(24, 24, 24),
                                       padding=0.25)
    w, h, d = int(whd[0]), int(whd[1]), int(whd[2])
    # grid lattice position of voxel (i,j,k)
    size = (1.5, 1.5, 1.5)

    def at(i, j, k):
        return values[k, j, i]

    # center voxel: inside, distance ~ -0.5
    ci = (w - 1) // 2
    assert at(ci, ci, ci) < 0
    assert at(ci, ci, ci) == pytest.approx(-0.5, abs=0.06)
    # corner voxel: outside
    assert at(0, 0, 0) > 0
    assert at(0, 0, 0) == pytest.approx(np.sqrt(3 * 0.25 ** 2), abs=0.06)
    # a voxel just outside a face: positive, ~distance to the face
    assert at(ci, ci, w - 1) > 0


# ---------------------------------------------------------------------------
# SDF lights + end-to-end implicit shader
# ---------------------------------------------------------------------------

def test_sdf_light_pdf_positive_toward_light():
    ds, lights, _ = _ds()
    assert any(l.kind == 2 for l in lights)

    def sdf_light_fn(position, direction, sdf_id):
        hit, t, _, _ = S.spheretrace(ds, position, direction, 256,
                                     sdf_id=sdf_id)
        lpos = position + direction * t[..., None]
        n = S.eval_sdf_normal(ds, lpos, t)
        return hit, t, n

    pos = jnp.asarray([[0.0, -0.4, 0.0], [0.0, -0.4, 0.0]])
    # light box spans world [-0.2,0.2]x[0.55,0.95]x[0.2,0.25]
    to_light = jnp.asarray([[0.0, 0.75 - (-0.4), 0.225 - 0.0]])
    to_light = to_light / jnp.linalg.norm(to_light)
    away = jnp.asarray([[0.0, -1.0, 0.0]])
    dirs = jnp.concatenate([to_light, away], axis=0)
    pdf = np.asarray(sample_lights_pdf(ds, lights, pos, dirs,
                                       spheretrace_fn=sdf_light_fn))
    # away from the rect light only the (textureless) environment light
    # contributes: uniform-sphere pdf 1/(4*pi), averaged over L lights
    L = len(lights)
    env_only = 1.0 / (4 * np.pi) / L
    assert pdf[1] == pytest.approx(env_only, rel=1e-4)
    assert pdf[0] > pdf[1]  # rect light adds solid-angle density


def test_implicit_shader_end_to_end():
    from vpt_tpu.render.implicit import make_implicit_shader
    from vpt_tpu.renderer import RenderParams

    ds, lights, scene = _ds()
    params = RenderParams(shader="implicit", bounces=3,
                          spheretrace_maxiter=128, samples=4)
    shade = make_implicit_shader(lights, len(scene.environments),
                                 params=params)
    n = 24
    xs = (jnp.arange(n) + 0.5) / n * 1.4 - 0.7
    o = jnp.stack([xs, jnp.zeros(n), jnp.full((n,), 1.5)], axis=-1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    pix = jnp.arange(n, dtype=jnp.uint32)
    radiance, alpha = jax.jit(shade)(ds, o, d, pix, jnp.int32(0))
    radiance = np.asarray(radiance)
    assert np.all(np.isfinite(radiance))
    assert radiance.max() > 0.01  # spheres are lit
    # rays at x ~ 0 hit the grid sphere; env-only rays differ from hits
    assert np.asarray(alpha).min() == 1.0  # implicit alpha is 1 (cpp:534)


def test_implicit_normal_shader():
    from vpt_tpu.render.implicit import make_implicit_shader
    from vpt_tpu.renderer import RenderParams

    ds, lights, scene = _ds()
    params = RenderParams(shader="implicit_normal", spheretrace_maxiter=128)
    shade = make_implicit_shader(lights, len(scene.environments),
                                 params=params, normal_only=True)
    o = jnp.asarray([[0.0, 0.0, 1.5], [5.0, 5.0, 1.5]])
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (2, 1))
    val, hit = shade(ds, o, d, jnp.arange(2, dtype=jnp.uint32), jnp.int32(0))
    val = np.asarray(val)
    # head-on hit at the grid sphere: normal ~ +z -> color ~ (.5, .5, 1)
    np.testing.assert_allclose(val[0], [0.5, 0.5, 1.0], atol=0.05)
    np.testing.assert_allclose(val[1], [0.0, 0.0, 0.0], atol=1e-6)


def test_spheretrace_queued_matches_lockstep():
    """The work-queue sphere tracer must reproduce the lock-step loop
    exactly (identical per-ray march arithmetic, just different lane
    scheduling)."""
    import jax
    import jax.numpy as jnp
    import numpy as np

    import vpt_tpu.ops.sdf as S
    from vpt_tpu.renderer import Renderer, RenderParams

    r = Renderer("/root/reference/tests/07_sdfunction/sdfunction.json",
                 RenderParams(shader="implicit", samples=1, resolution=48),
                 devices=1)
    R = 1024
    key = jax.random.PRNGKey(7)
    o = jax.random.uniform(key, (R, 3), minval=-2.0, maxval=2.0)
    d = jax.random.normal(jax.random.PRNGKey(8), (R, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    alive = jax.random.uniform(jax.random.PRNGKey(9), (R,)) < 0.9

    lock = jax.jit(lambda: S.spheretrace(r.ds, o, d, 96, alive=alive))()
    orig_min, orig_lanes = S._QUEUE_MIN_RAYS, S._QUEUE_LANES
    S._QUEUE_MIN_RAYS, S._QUEUE_LANES = 256, 128
    try:
        qd = jax.jit(lambda: S.spheretrace(r.ds, o, d, 96, alive=alive))()
    finally:
        S._QUEUE_MIN_RAYS, S._QUEUE_LANES = orig_min, orig_lanes
    np.testing.assert_array_equal(np.asarray(lock[0]), np.asarray(qd[0]))
    m = np.asarray(lock[0])
    np.testing.assert_allclose(np.asarray(lock[1])[m], np.asarray(qd[1])[m],
                               rtol=0, atol=0)
    np.testing.assert_array_equal(np.asarray(lock[2]), np.asarray(qd[2]))
    np.testing.assert_array_equal(np.asarray(lock[3]), np.asarray(qd[3]))
