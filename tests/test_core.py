"""Unit tests for core math, RNG, and samplers against closed forms."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from vpt_tpu.core import rng, sampling, vecmath as vm


def test_normalize_and_dot():
    v = jnp.array([[3.0, 0.0, 4.0], [0.0, 0.0, 0.0]])
    n = vm.normalize(v)
    np.testing.assert_allclose(n[0], [0.6, 0.0, 0.8], rtol=1e-6)
    np.testing.assert_allclose(n[1], [0.0, 0.0, 0.0])  # zero-safe
    np.testing.assert_allclose(vm.dot(v, v), [25.0, 0.0])


def test_reflect_refract():
    n = jnp.array([0.0, 0.0, 1.0])
    w = vm.normalize(jnp.array([1.0, 0.0, 1.0]))
    r = vm.reflect(w, n)
    np.testing.assert_allclose(r, vm.normalize(jnp.array([-1.0, 0.0, 1.0])), atol=1e-6)
    # refraction into denser medium bends toward normal
    t = vm.refract(w, n, 1.0 / 1.5)
    assert t[2] < 0  # transmitted goes below surface
    sin_in = np.sqrt(1 - vm.dot(w, n) ** 2)
    sin_out = np.sqrt(1 - vm.dot(-t, -n) ** 2)
    np.testing.assert_allclose(sin_in, 1.5 * sin_out, rtol=1e-5)
    # total internal reflection returns zero
    w_shallow = vm.normalize(jnp.array([1.0, 0.0, 0.05]))
    t2 = vm.refract(w_shallow, n, 1.5)
    np.testing.assert_allclose(t2, 0.0)


def test_basis_fromz_orthonormal():
    np.random.seed(0)
    v = jnp.asarray(np.random.randn(64, 3).astype(np.float32))
    basis = np.asarray(vm.basis_fromz(v), dtype=np.float64)
    # gram matrix in float64 numpy (jnp.einsum may run at reduced precision)
    eye = np.einsum("bij,bkj->bik", basis, basis)
    np.testing.assert_allclose(eye, np.tile(np.eye(3), (64, 1, 1)), atol=1e-5)
    np.testing.assert_allclose(basis[:, 2], vm.normalize(v), atol=1e-6)


def test_frame_roundtrip():
    frame = jnp.asarray(
        vm.frame_from_flat(
            [0.8151804, -0.0, 0.5792072, 0.16660169, 0.95773935, -0.23447643,
             -0.5547295, 0.2876375, 0.78073043, -0.75, 0.4, 0.9]
        )
    )
    p = jnp.array([[0.3, -0.2, 1.7]])
    q = vm.transform_point(frame, p)
    back = vm.transform_point(vm.frame_inverse(frame), q)
    np.testing.assert_allclose(back, p, atol=1e-5)


def test_rng_uniform_statistics():
    n = 1 << 16
    px = jnp.arange(n, dtype=jnp.uint32)
    u = rng.uniform_float(px, 0, 0)
    u = np.asarray(u)
    assert u.min() >= 0.0 and u.max() < 1.0
    assert abs(u.mean() - 0.5) < 0.005
    assert abs(np.var(u) - 1 / 12) < 0.002
    # different slots decorrelate
    v = np.asarray(rng.uniform_float(px, 0, 1))
    assert abs(np.corrcoef(u, v)[0, 1]) < 0.02
    # different samples decorrelate
    w = np.asarray(rng.uniform_float(px, 1, 0))
    assert abs(np.corrcoef(u, w)[0, 1]) < 0.02


def test_sample_hemisphere_cos_moments():
    n = 1 << 15
    px = jnp.arange(n, dtype=jnp.uint32)
    ruv = jnp.stack(
        [rng.uniform_float(px, 0, 0), rng.uniform_float(px, 0, 1)], axis=-1
    )
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    d = sampling.sample_hemisphere_cos(normal, ruv)
    cosw = np.asarray(d[:, 2])
    assert cosw.min() >= 0
    # E[cos] = 2/3 for cosine-weighted hemisphere
    assert abs(cosw.mean() - 2 / 3) < 0.01
    pdf = sampling.sample_hemisphere_cos_pdf(normal, d)
    np.testing.assert_allclose(np.asarray(pdf), cosw / np.pi, rtol=1e-5)


def test_sample_discrete_matches_masses():
    cdf = jnp.array([1.0, 3.0, 3.5, 7.5])  # masses 1,2,.5,4
    n = 1 << 16
    r = rng.uniform_float(jnp.arange(n, dtype=jnp.uint32), 0, 0)
    idx = np.asarray(sampling.sample_discrete(cdf, r))
    freq = np.bincount(idx, minlength=4) / n
    np.testing.assert_allclose(freq, [1 / 7.5, 2 / 7.5, 0.5 / 7.5, 4 / 7.5], atol=0.01)
    pdf = sampling.sample_discrete_pdf(jnp.tile(cdf, (4, 1)), jnp.arange(4))
    np.testing.assert_allclose(np.asarray(pdf), [1.0, 2.0, 0.5, 4.0], rtol=1e-6)


def test_sample_triangle_uniform():
    n = 1 << 14
    px = jnp.arange(n, dtype=jnp.uint32)
    ruv = jnp.stack([rng.uniform_float(px, 0, 0), rng.uniform_float(px, 0, 1)], axis=-1)
    uv = np.asarray(sampling.sample_triangle_uv(ruv))
    assert (uv.sum(-1) <= 1.0 + 1e-6).all() and (uv >= 0).all()
    # centroid of uniform samples ~ (1/3, 1/3)
    np.testing.assert_allclose(uv.mean(0), [1 / 3, 1 / 3], atol=0.01)
