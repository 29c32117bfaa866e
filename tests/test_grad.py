"""Gradient checks: AD pixel gradients vs finite differences
(BASELINE.json: "pixel gradients must match finite differences" for
materials, volume coefficients, SDF grid values).

One shared jitted render + one jitted grad are reused for every parameter
(recompiling per test is too slow on the CPU test backend)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.parallel.mesh import extract_params, insert_params
from vpt_tpu.render.integrator import make_path_shader
from vpt_tpu.render.lights import build_lights_static
from vpt_tpu.render.state import camera_rays
from vpt_tpu.scene.flatten import flatten_scene
from vpt_tpu.scene.testing import make_test_scene

_CACHE = {}


def _setup(width=16, height=8, bounces=3, n_samples=2):
    if "fns" in _CACHE:
        return _CACHE["fns"]
    scene = make_test_scene(sphere_steps=5)
    arrays = flatten_scene(scene)
    lights = build_lights_static(arrays)
    ds = jax.tree.map(jnp.asarray, arrays)
    shade = make_path_shader(lights, len(scene.environments), bounces=bounces)

    def render_mean(params):
        ds_p = insert_params(ds, params)
        pix = jnp.arange(width * height, dtype=jnp.uint32)
        acc = jnp.zeros(())
        for s in range(n_samples):
            o, d = camera_rays(ds_p, 0, width, height, pix, jnp.int32(s), 64)
            radiance, _ = shade(ds_p, o, d, pix, jnp.int32(s))
            acc = acc + jnp.mean(radiance)
        return acc / n_samples

    fwd = jax.jit(render_mean)
    grad = jax.jit(jax.grad(render_mean))
    params = extract_params(ds)
    grads = grad(params)  # compile once, reuse values for all param checks
    _CACHE["fns"] = (fwd, grads, params)
    return _CACHE["fns"]


def _fd(fwd, params, key, index, h):
    val = np.asarray(params[key]).copy()

    def at(x):
        v = val.copy()
        v[index] = x
        p2 = dict(params)
        p2[key] = jnp.asarray(v)
        return float(fwd(p2))

    return (at(val[index] + h) - at(val[index] - h)) / (2 * h)


@pytest.mark.parametrize(
    "key,index,h,rel_tol",
    [
        ("mat_color", (0, 0), 1e-2, 0.1),        # floor albedo red
        ("mat_emission", (4, 1), 0.5, 0.1),       # area light emission green
        ("mat_scattering", (2, 0), 2e-2, 0.35),   # smoke scattering albedo
        ("mat_trdepth", (1,), 2e-3, 0.35),        # glass density reparam
        ("mat_scanisotropy", (2,), 5e-2, 0.35),   # smoke HG anisotropy g=-0.4
    ],
)
def test_grad_matches_fd(key, index, h, rel_tol):
    fwd, grads, params = _setup()
    g_ad = float(np.asarray(grads[key])[index])
    g_fd = _fd(fwd, params, key, index, h)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    denom = max(abs(g_fd), abs(g_ad), 1e-4)
    assert abs(g_ad - g_fd) / denom < rel_tol, (
        f"{key}{index}: ad={g_ad:.6g} fd={g_fd:.6g}")


def test_grad_emission_positive():
    _, grads, _ = _setup()
    # more light emission must brighten the image
    assert float(np.asarray(grads["mat_emission"])[4, 1]) > 0


# ---------------------------------------------------------------------------
# SDF grid-value gradients (BASELINE.json: "SDF grid values"), through the
# implicit-function reattachment of the sphere-trace hit distance
# (ops/sdf.py reattach_t) and the full implicit shader.
# ---------------------------------------------------------------------------

def _setup_sdf():
    if "sdf" in _CACHE:
        return _CACHE["sdf"]
    from vpt_tpu.render.implicit import make_implicit_shader
    from vpt_tpu.renderer import RenderParams
    from vpt_tpu.scene.testing import make_sdf_test_scene

    scene = make_sdf_test_scene()
    arrays = flatten_scene(scene)
    lights = build_lights_static(arrays)
    ds = jax.tree.map(jnp.asarray, arrays)
    rp = RenderParams(shader="implicit", bounces=2, spheretrace_maxiter=96)
    shade = make_implicit_shader(lights, len(scene.environments), params=rp)

    # a small bundle of rays well inside the grid sphere's silhouette
    n = 16
    xs = (jnp.arange(n) + 0.5) / n * 0.3 - 0.15
    o = jnp.stack([xs, jnp.zeros(n), jnp.full((n,), 1.5)], axis=-1)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]]), (n, 1))
    pix = jnp.arange(n, dtype=jnp.uint32)

    def mean_radiance(grid_values):
        ds_p = ds._replace(grid_values=grid_values)
        radiance, _ = shade(ds_p, o, d, pix, jnp.int32(0))
        return jnp.mean(radiance)

    def mean_depth(grid_values):
        from vpt_tpu.ops.sdf import reattach_t, spheretrace

        ds_p = ds._replace(grid_values=grid_values)
        hit, t_det, _, _ = spheretrace(ds_p, o, d, 96)
        return jnp.mean(reattach_t(ds_p, o, d, t_det, hit))

    _CACHE["sdf"] = (
        jax.jit(mean_radiance), jax.jit(jax.grad(mean_radiance)),
        jax.jit(mean_depth), jax.jit(jax.grad(mean_depth)), ds.grid_values)
    return _CACHE["sdf"]


def _fd_voxel(fwd, grid_values, vox, h):
    base = np.asarray(grid_values).copy()

    def at(x):
        v = base.copy()
        v[vox] = x
        return float(fwd(jnp.asarray(v)))

    return (at(base[vox] + h) - at(base[vox] - h)) / (2 * h)


# the head-on bundle hits the grid sphere (r=0.3, centered in a unit box of
# 24^3 voxels) near local (0.5, 0.5, 0.8): front-face cell corners z=18,
# y,x in {11, 12}
_FRONT_VOXEL = (0, 18, 11, 12)  # (grid, z, y, x)


def test_grad_sdf_grid_depth_matches_fd():
    """Raising a front-surface voxel value pushes the zero crossing deeper:
    dt/dvalue through reattach_t must match finite differences."""
    _, _, fwd_t, grad_t, gv = _setup_sdf()
    g_ad = float(np.asarray(grad_t(gv))[_FRONT_VOXEL])
    g_fd = _fd_voxel(fwd_t, gv, _FRONT_VOXEL, 2e-3)
    assert np.isfinite(g_ad) and g_ad > 0  # larger distance value -> later hit
    assert abs(g_ad - g_fd) / max(abs(g_fd), 1e-6) < 0.1, (
        f"ad={g_ad:.6g} fd={g_fd:.6g}")


def test_grad_sdf_grid_radiance_matches_fd():
    fwd, grad, _, _, gv = _setup_sdf()
    g_ad = float(np.asarray(grad(gv))[_FRONT_VOXEL])
    g_fd = _fd_voxel(fwd, gv, _FRONT_VOXEL, 5e-3)
    assert np.isfinite(g_ad) and np.isfinite(g_fd)
    denom = max(abs(g_fd), abs(g_ad), 1e-5)
    assert abs(g_ad - g_fd) / denom < 0.35, f"ad={g_ad:.6g} fd={g_fd:.6g}"
