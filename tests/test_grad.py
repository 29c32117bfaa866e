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
