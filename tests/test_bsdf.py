"""BSDF / phase-function consistency tests.

Strategy (the reference has no unit tests — SURVEY.md §4): validate each lobe
against closed forms and self-consistency: pdfs integrate to 1 over the
sphere, sample/pdf/eval agree in Monte Carlo expectation (white-furnace style),
and the phase function has mean cosine g.
"""

import jax.numpy as jnp
import numpy as np

from vpt_tpu.core import rng
from vpt_tpu.ops import bsdf, microfacet as mf, volume as vol


def _uniform_sphere(n, seed_slot=0):
    px = jnp.arange(n, dtype=jnp.uint32)
    u = rng.uniform_float(px, 7, seed_slot)
    v = rng.uniform_float(px, 7, seed_slot + 1)
    z = 2 * v - 1
    r = jnp.sqrt(jnp.clip(1 - z * z, 0, 1))
    phi = 2 * np.pi * u
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def _mk_material(mtype, color=(0.7, 0.6, 0.5), roughness=0.2, ior=1.5, metallic=0.0,
                 n=1):
    ones = jnp.ones((n,))
    c3 = jnp.broadcast_to(jnp.asarray(color, jnp.float32), (n, 3))
    return bsdf.MaterialPoint(
        mtype=jnp.full((n,), mtype, jnp.int32),
        emission=jnp.zeros((n, 3)),
        color=c3,
        opacity=ones,
        roughness=ones * roughness,
        metallic=ones * metallic,
        ior=ones * ior,
        density=jnp.zeros((n, 3)),
        scattering=jnp.zeros((n, 3)),
        scanisotropy=jnp.zeros((n,)),
        trdepth=ones * 0.01,
    )


def test_fresnel_dielectric_limits():
    n = jnp.array([[0.0, 0.0, 1.0]])
    # normal incidence: ((eta-1)/(eta+1))^2
    f0 = mf.fresnel_dielectric(1.5, n, jnp.array([[0.0, 0.0, 1.0]]))
    np.testing.assert_allclose(f0, ((1.5 - 1) / (1.5 + 1)) ** 2, rtol=1e-5)
    # grazing: -> 1
    g = mf.fresnel_dielectric(1.5, n, jnp.array([[1.0, 0.0, 1e-4]]))
    assert g[0] > 0.99
    # TIR from inside
    t = mf.fresnel_dielectric(1 / 1.5, n, jnp.array([[0.9, 0.0, 0.2]]))
    np.testing.assert_allclose(t, 1.0)


def test_ggx_distribution_normalizes():
    # integral over hemisphere of D(h) cos(h) dh = 1
    n = 1 << 16
    d = _uniform_sphere(n)
    d = d.at[:, 2].set(jnp.abs(d[:, 2]))  # fold to upper hemisphere
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    for rough in [0.1, 0.4, 0.9]:
        dd = mf.microfacet_distribution(rough, normal, d)
        integ = np.mean(np.asarray(dd * d[:, 2])) * 2 * np.pi  # hemisphere area
        np.testing.assert_allclose(integ, 1.0, rtol=0.08)


def _pdf_integrates_to_one(m, outgoing, pdf_fn, tol=0.05):
    n = 1 << 17
    d = _uniform_sphere(n, seed_slot=3)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    import jax

    mm = jax.tree.map(lambda x: jnp.broadcast_to(x[:1], (n,) + x.shape[1:]), m)
    out = jnp.broadcast_to(outgoing, (n, 3))
    pdf = np.asarray(pdf_fn(mm, normal, out, d))
    integ = pdf.mean() * 4 * np.pi
    np.testing.assert_allclose(integ, 1.0, rtol=tol)


def test_matte_pdf_normalized_and_reciprocal():
    m = _mk_material(bsdf.MATTE, roughness=1.0)
    out = jnp.array([0.3, 0.1, 0.95])
    _pdf_integrates_to_one(m, out / jnp.linalg.norm(out), bsdf.sample_bsdfcos_pdf)


def test_glossy_pdf_normalized():
    m = _mk_material(bsdf.GLOSSY, roughness=0.3 * 0.3)
    out = jnp.array([0.3, 0.0, 0.95])
    _pdf_integrates_to_one(m, out / jnp.linalg.norm(out), bsdf.sample_bsdfcos_pdf, tol=0.1)


def test_reflective_pdf_normalized():
    m = _mk_material(bsdf.REFLECTIVE, roughness=0.4 * 0.4)
    out = jnp.array([0.2, 0.1, 0.9])
    _pdf_integrates_to_one(m, out / jnp.linalg.norm(out), bsdf.sample_bsdfcos_pdf, tol=0.1)


def test_refractive_sample_pdf_consistency():
    """Histogram-consistency of sample_refractive vs its pdf.

    The reference pdf (yocto_shading.h:920-942) omits Walter eq.17's eta^2
    jacobian factor on the transmission branch; we reproduce the reference
    exactly (goldens bake it in), so the transmission-side density ratio is
    rel_ior^2 = 2.25 and the reflection side is 1.
    """
    n = 1 << 17
    m = _mk_material(bsdf.REFRACTIVE, color=(1, 1, 1), roughness=0.25, n=n)
    px = jnp.arange(n, dtype=jnp.uint32)
    rn = jnp.stack([rng.uniform_float(px, 21, 0), rng.uniform_float(px, 21, 1)], axis=-1)
    rnl = rng.uniform_float(px, 21, 2)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    out = jnp.array([0.2, 0.0, 0.98])
    out = jnp.broadcast_to(out / jnp.linalg.norm(out), (n, 3))
    inc = bsdf.sample_bsdfcos(m, normal, out, rnl, rn)
    valid = np.asarray(jnp.any(inc != 0, axis=-1))
    assert valid.mean() > 0.95
    pdf = np.asarray(bsdf.sample_bsdfcos_pdf(m, normal, out, inc))
    z = np.asarray(inc)[:, 2]
    # transmission bulk: z in [-1, -0.9)
    sel_t = valid & (z < -0.9)
    sa_est = np.mean(np.where(sel_t, 1.0 / np.maximum(pdf, 1e-12), 0.0))
    np.testing.assert_allclose(sa_est / (2 * np.pi * 0.1), 1.5**2, rtol=0.1)
    # reflection bulk: z in [0.9, 1)
    sel_r = valid & (z > 0.9)
    sa_est_r = np.mean(np.where(sel_r, 1.0 / np.maximum(pdf, 1e-12), 0.0))
    np.testing.assert_allclose(sa_est_r / (2 * np.pi * 0.1), 1.0, rtol=0.15)


def test_matte_white_furnace():
    """E[eval/pdf] over BSDF samples equals the albedo for a white matte."""
    n = 1 << 15
    m = _mk_material(bsdf.MATTE, color=(1.0, 1.0, 1.0), roughness=1.0, n=n)
    px = jnp.arange(n, dtype=jnp.uint32)
    rn = jnp.stack([rng.uniform_float(px, 11, 0), rng.uniform_float(px, 11, 1)], axis=-1)
    rnl = rng.uniform_float(px, 11, 2)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    out = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    inc = bsdf.sample_bsdfcos(m, normal, out, rnl, rn)
    f = bsdf.eval_bsdfcos(m, normal, out, inc)
    pdf = bsdf.sample_bsdfcos_pdf(m, normal, out, inc)
    ratio = np.asarray(f) / np.asarray(pdf)[:, None]
    np.testing.assert_allclose(ratio.mean(0), [1.0, 1.0, 1.0], rtol=1e-4)


def test_delta_lobes_conserve():
    """Delta reflective: eval/pdf == fresnel reflectance; refractive sums to ~1."""
    n = 4
    m = _mk_material(bsdf.REFRACTIVE, color=(1.0, 1.0, 1.0), roughness=0.0, n=n)
    normal = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    out = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    # reflection side
    rnl = jnp.array([0.0, 0.0, 1.0 - 1e-6, 1.0 - 1e-6])
    inc = bsdf.sample_delta(m, normal, out, rnl)
    f = bsdf.eval_delta(m, normal, out, inc)
    pdf = bsdf.sample_delta_pdf(m, normal, out, inc)
    w = np.asarray(f)[:, 0] / np.asarray(pdf)
    # rnl=0 -> reflect with weight F/F = 1; rnl~1 -> refract weight (1-F)/eta^2/(1-F)
    np.testing.assert_allclose(w[0], 1.0, rtol=1e-5)
    np.testing.assert_allclose(w[2], 1.0 / 1.5**2, rtol=1e-4)


def test_phasefunction_normalized_and_mean_cosine():
    n = 1 << 17
    d = _uniform_sphere(n, seed_slot=5)
    out = jnp.broadcast_to(jnp.array([0.0, 0.0, 1.0]), (n, 3))
    for g in [-0.8, 0.0, 0.3]:
        p = np.asarray(vol.eval_phasefunction(g, out, d))
        np.testing.assert_allclose(p.mean() * 4 * np.pi, 1.0, rtol=0.03)
    # sampling: mean cosine of (-out, inc) equals g
    px = jnp.arange(n, dtype=jnp.uint32)
    rn = jnp.stack([rng.uniform_float(px, 13, 0), rng.uniform_float(px, 13, 1)], axis=-1)
    for g in [-0.8, 0.3]:
        inc = vol.sample_phasefunction(g, out, rn)
        cosv = np.asarray(-jnp.sum(out * inc, axis=-1))
        np.testing.assert_allclose(cosv.mean(), g, atol=0.01)
        # pdf consistency
        pdf = np.asarray(vol.sample_phasefunction_pdf(g, out, inc))
        p = np.asarray(vol.eval_phasefunction(g, out, inc))
        np.testing.assert_allclose(pdf, p)


def test_transmittance_sampling():
    n = 1 << 16
    px = jnp.arange(n, dtype=jnp.uint32)
    rl = rng.uniform_float(px, 17, 0)
    rd = rng.uniform_float(px, 17, 1)
    density = jnp.broadcast_to(jnp.array([0.5, 1.0, 2.0]), (n, 3))
    maxd = jnp.full((n,), 1e6)
    dist = vol.sample_transmittance(density, maxd, rl, rd)
    # expected distance: mean over channels of 1/sigma = (2 + 1 + 0.5)/3
    np.testing.assert_allclose(np.asarray(dist).mean(), (2 + 1 + 0.5) / 3, rtol=0.02)
    # pdf at sampled distances: MC estimate of int pdf = 1
    pdf = vol.sample_transmittance_pdf(density, dist, maxd)
    tr = vol.eval_transmittance(density, dist)
    assert np.isfinite(np.asarray(pdf)).all() and (np.asarray(pdf) > 0).all()
    assert (np.asarray(tr) <= 1.0).all()
    # surface-hit branch: bounded distance returns max and survival pdf
    maxd2 = jnp.full((n,), 0.1)
    dist2 = vol.sample_transmittance(density, maxd2, rl, rd)
    assert (np.asarray(dist2) <= 0.1 + 1e-7).all()
    pdf2 = np.asarray(vol.sample_transmittance_pdf(density, jnp.full((n,), 0.1), maxd2))
    expected = np.mean(np.exp(-np.array([0.5, 1.0, 2.0]) * 0.1))
    np.testing.assert_allclose(pdf2, expected, rtol=1e-5)
