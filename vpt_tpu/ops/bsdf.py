"""BSDF lobe library and branchless material dispatch.

Reimplements the eval/sample/pdf triples of yocto_shading.h:543-1039 and the
per-material-type dispatch of yocto_pathtrace.cpp:86-236 in fully batched,
maskable form: every lobe is evaluated where its material mask is set and the
results are combined with one-hot selects. This is the standard wavefront
formulation — no divergent control flow, everything runs on the VPU and is
differentiable w.r.t. material parameters.

Material type codes follow the reference enum order
(/root/reference/libs/yocto/yocto_scene.h:105-110).
"""

from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..core.sampling import sample_hemisphere_cos, sample_hemisphere_cos_pdf
from ..core.vecmath import PIF, dot, normalize, reflect, refract
from .microfacet import (
    eta_to_reflectivity,
    fresnel_conductor,
    fresnel_dielectric,
    fresnel_schlick,
    microfacet_distribution,
    microfacet_shadowing,
    reflectivity_to_eta,
    sample_microfacet,
    sample_microfacet_pdf,
)

MATTE, GLOSSY, REFLECTIVE, TRANSPARENT, REFRACTIVE, SUBSURFACE, VOLUMETRIC, GLTFPBR = range(8)

MIN_ROUGHNESS = 0.03 * 0.03  # yocto_scene.cpp:191


class MaterialPoint(NamedTuple):
    """Batched material_point (yocto_scene.h:292-304)."""

    mtype: jnp.ndarray        # (...,) int32
    emission: jnp.ndarray     # (..., 3)
    color: jnp.ndarray        # (..., 3)
    opacity: jnp.ndarray      # (...,)
    roughness: jnp.ndarray    # (...,) already squared+clamped at eval time
    metallic: jnp.ndarray     # (...,)
    ior: jnp.ndarray          # (...,)
    density: jnp.ndarray      # (..., 3)
    scattering: jnp.ndarray   # (..., 3)
    scanisotropy: jnp.ndarray # (...,)
    trdepth: jnp.ndarray      # (...,)


def is_delta(m: MaterialPoint):
    """yocto_scene.cpp:256-263."""
    r0 = m.roughness == 0.0
    return (
        ((m.mtype == REFLECTIVE) & r0)
        | ((m.mtype == REFRACTIVE) & r0)
        | ((m.mtype == TRANSPARENT) & r0)
        | (m.mtype == VOLUMETRIC)
    )


def is_volumetric(m: MaterialPoint):
    """yocto_scene.cpp:265-269 (has_volume)."""
    return (m.mtype == REFRACTIVE) | (m.mtype == VOLUMETRIC) | (m.mtype == SUBSURFACE)


def eval_emission(m: MaterialPoint, normal, outgoing):
    """yocto_pathtrace.cpp:86-89."""
    return jnp.where((dot(normal, outgoing) >= 0.0)[..., None], m.emission, 0.0)


def _up_normal(normal, outgoing):
    return jnp.where((dot(normal, outgoing) <= 0.0)[..., None], -normal, normal)


def _same_hemi(normal, outgoing, incoming):
    return dot(normal, outgoing) * dot(normal, incoming) >= 0.0


# ---------------------------------------------------------------------------
# matte (yocto_shading.h:543-562)
# ---------------------------------------------------------------------------

def eval_matte(color, normal, outgoing, incoming):
    val = color / PIF * jnp.abs(dot(normal, incoming))[..., None]
    bad = (dot(normal, incoming) * dot(normal, outgoing) <= 0.0)[..., None]
    return jnp.where(bad, 0.0, val)


def sample_matte(color, normal, outgoing, rn):
    return sample_hemisphere_cos(_up_normal(normal, outgoing), rn)


def sample_matte_pdf(color, normal, outgoing, incoming):
    bad = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    pdf = sample_hemisphere_cos_pdf(_up_normal(normal, outgoing), incoming)
    return jnp.where(bad, 0.0, pdf)


# ---------------------------------------------------------------------------
# glossy (yocto_shading.h:565-605)
# ---------------------------------------------------------------------------

def eval_glossy(color, ior, roughness, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    f1 = fresnel_dielectric(ior, up, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_dielectric(ior, halfway, incoming)
    d = microfacet_distribution(roughness, up, halfway)
    g = microfacet_shadowing(roughness, up, halfway, outgoing, incoming)
    ndi = dot(up, incoming)
    ndo = dot(up, outgoing)
    spec_den = 4.0 * ndo * ndi
    spec = f * d * g / jnp.where(spec_den != 0.0, spec_den, 1.0) * jnp.abs(ndi)
    val = color * ((1.0 - f1) / PIF * jnp.abs(ndi))[..., None] + spec[..., None]
    bad = (dot(normal, incoming) * dot(normal, outgoing) <= 0.0)[..., None]
    return jnp.where(bad, 0.0, val)


def sample_glossy(color, ior, roughness, normal, outgoing, rnl, rn):
    up = _up_normal(normal, outgoing)
    halfway = sample_microfacet(roughness, up, rn)
    refl = reflect(outgoing, halfway)
    refl = jnp.where(_same_hemi(up, outgoing, refl)[..., None], refl, 0.0)
    diff = sample_hemisphere_cos(up, rn)
    take_spec = rnl < fresnel_dielectric(ior, up, outgoing)
    return jnp.where(take_spec[..., None], refl, diff)


def sample_glossy_pdf(color, ior, roughness, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    f = fresnel_dielectric(ior, up, outgoing)
    doh = jnp.abs(dot(outgoing, halfway))
    spec_pdf = sample_microfacet_pdf(roughness, up, halfway) / jnp.where(
        doh != 0.0, 4.0 * doh, 1.0
    )
    pdf = f * spec_pdf + (1.0 - f) * sample_hemisphere_cos_pdf(up, incoming)
    bad = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    return jnp.where(bad, 0.0, pdf)


# ---------------------------------------------------------------------------
# reflective, rough + delta (yocto_shading.h:608-698, color parametrization)
# ---------------------------------------------------------------------------

def eval_reflective(color, roughness, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_conductor(reflectivity_to_eta(color), jnp.zeros_like(color), halfway, incoming)
    d = microfacet_distribution(roughness, up, halfway)
    g = microfacet_shadowing(roughness, up, halfway, outgoing, incoming)
    ndi = dot(up, incoming)
    ndo = dot(up, outgoing)
    den = 4.0 * ndo * ndi
    val = f * (d * g / jnp.where(den != 0.0, den, 1.0) * jnp.abs(ndi))[..., None]
    bad = (dot(normal, incoming) * dot(normal, outgoing) <= 0.0)[..., None]
    return jnp.where(bad, 0.0, val)


def sample_reflective(color, roughness, normal, outgoing, rn):
    up = _up_normal(normal, outgoing)
    halfway = sample_microfacet(roughness, up, rn)
    incoming = reflect(outgoing, halfway)
    return jnp.where(_same_hemi(up, outgoing, incoming)[..., None], incoming, 0.0)


def sample_reflective_pdf(color, roughness, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    doh = jnp.abs(dot(outgoing, halfway))
    pdf = sample_microfacet_pdf(roughness, up, halfway) / jnp.where(doh != 0.0, 4.0 * doh, 1.0)
    bad = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    return jnp.where(bad, 0.0, pdf)


def eval_reflective_delta(color, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    f = fresnel_conductor(reflectivity_to_eta(color), jnp.zeros_like(color), up, outgoing)
    bad = (dot(normal, incoming) * dot(normal, outgoing) <= 0.0)[..., None]
    return jnp.where(bad, 0.0, f)


def sample_reflective_delta(color, normal, outgoing):
    return reflect(outgoing, _up_normal(normal, outgoing))


def sample_reflective_delta_pdf(color, normal, outgoing, incoming):
    bad = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    return jnp.where(bad, 0.0, 1.0)


# ---------------------------------------------------------------------------
# transparent, rough + delta (yocto_shading.h:775-867)
# ---------------------------------------------------------------------------

def eval_transparent(color, ior, roughness, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    same = _same_hemi(normal, outgoing, incoming)
    # reflection branch
    hw_r = normalize(incoming + outgoing)
    f_r = fresnel_dielectric(ior, hw_r, outgoing)
    d_r = microfacet_distribution(roughness, up, hw_r)
    g_r = microfacet_shadowing(roughness, up, hw_r, outgoing, incoming)
    ndi = dot(up, incoming)
    ndo = dot(up, outgoing)
    den_r = 4.0 * ndo * ndi
    val_r = (f_r * d_r * g_r / jnp.where(den_r != 0.0, den_r, 1.0) * jnp.abs(ndi))[..., None]
    # transmission branch
    reflected = reflect(-incoming, up)
    hw_t = normalize(reflected + outgoing)
    f_t = fresnel_dielectric(ior, hw_t, outgoing)
    d_t = microfacet_distribution(roughness, up, hw_t)
    g_t = microfacet_shadowing(roughness, up, hw_t, outgoing, reflected)
    ndr = dot(up, reflected)
    den_t = 4.0 * ndo * ndr
    val_t = color * ((1.0 - f_t) * d_t * g_t / jnp.where(den_t != 0.0, den_t, 1.0)
                     * jnp.abs(ndr))[..., None]
    return jnp.where(same[..., None], val_r, val_t)


def sample_transparent(color, ior, roughness, normal, outgoing, rnl, rn):
    up = _up_normal(normal, outgoing)
    halfway = sample_microfacet(roughness, up, rn)
    take_refl = rnl < fresnel_dielectric(ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl = jnp.where(_same_hemi(up, outgoing, refl)[..., None], refl, 0.0)
    trans = -reflect(reflect(outgoing, halfway), up)
    trans = jnp.where(_same_hemi(up, outgoing, trans)[..., None], 0.0, trans)
    return jnp.where(take_refl[..., None], refl, trans)


def sample_transparent_pdf(color, ior, roughness, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    same = _same_hemi(normal, outgoing, incoming)
    hw_r = normalize(incoming + outgoing)
    doh_r = jnp.abs(dot(outgoing, hw_r))
    pdf_r = fresnel_dielectric(ior, hw_r, outgoing) * sample_microfacet_pdf(
        roughness, up, hw_r
    ) / jnp.where(doh_r != 0.0, 4.0 * doh_r, 1.0)
    reflected = reflect(-incoming, up)
    hw_t = normalize(reflected + outgoing)
    doh_t = jnp.abs(dot(outgoing, hw_t))
    pdf_t = (1.0 - fresnel_dielectric(ior, hw_t, outgoing)) * sample_microfacet_pdf(
        roughness, up, hw_t
    ) / jnp.where(doh_t != 0.0, 4.0 * doh_t, 1.0)
    return jnp.where(same, pdf_r, pdf_t)


def eval_transparent_delta(color, ior, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    same = _same_hemi(normal, outgoing, incoming)[..., None]
    f = fresnel_dielectric(ior, up, outgoing)[..., None]
    return jnp.where(same, f * jnp.ones_like(color), color * (1.0 - f))


def sample_transparent_delta(color, ior, normal, outgoing, rnl):
    up = _up_normal(normal, outgoing)
    take_refl = rnl < fresnel_dielectric(ior, up, outgoing)
    return jnp.where(take_refl[..., None], reflect(outgoing, up), -outgoing)


def sample_transparent_delta_pdf(color, ior, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    same = _same_hemi(normal, outgoing, incoming)
    f = fresnel_dielectric(ior, up, outgoing)
    return jnp.where(same, f, 1.0 - f)


# ---------------------------------------------------------------------------
# refractive, rough + delta (yocto_shading.h:870-988); subsurface aliases this
# ---------------------------------------------------------------------------

def eval_refractive(color, ior, roughness, normal, outgoing, incoming):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    same = _same_hemi(normal, outgoing, incoming)
    ndo = dot(normal, outgoing)
    ndi = dot(normal, incoming)
    # reflection branch
    hw_r = normalize(incoming + outgoing)
    f_r = fresnel_dielectric(rel_ior, hw_r, outgoing)
    d_r = microfacet_distribution(roughness, up, hw_r)
    g_r = microfacet_shadowing(roughness, up, hw_r, outgoing, incoming)
    den_r = jnp.abs(4.0 * ndo * ndi)
    val_r = f_r * d_r * g_r / jnp.where(den_r != 0.0, den_r, 1.0) * jnp.abs(ndi)
    # transmission branch ([Walter 2007] eq. 21)
    hw_t = -normalize(rel_ior[..., None] * incoming + outgoing) * jnp.where(
        entering[..., None], 1.0, -1.0
    )
    f_t = fresnel_dielectric(rel_ior, hw_t, outgoing)
    d_t = microfacet_distribution(roughness, up, hw_t)
    g_t = microfacet_shadowing(roughness, up, hw_t, outgoing, incoming)
    ohh = dot(outgoing, hw_t)
    ihh = dot(incoming, hw_t)
    den1 = ndo * ndi
    jac_den = (rel_ior * ihh + ohh) ** 2
    val_t = (
        jnp.abs(ohh * ihh / jnp.where(den1 != 0.0, den1, 1.0))
        * (1.0 - f_t) * d_t * g_t / jnp.where(jac_den != 0.0, jac_den, 1.0)
        * jnp.abs(ndi)
    )
    val = jnp.where(same, val_r, val_t)
    return val[..., None] * jnp.ones(3, dtype=val.dtype)


def sample_refractive(color, ior, roughness, normal, outgoing, rnl, rn):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    halfway = sample_microfacet(roughness, up, rn)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    take_refl = rnl < fresnel_dielectric(rel_ior, halfway, outgoing)
    refl = reflect(outgoing, halfway)
    refl = jnp.where(_same_hemi(up, outgoing, refl)[..., None], refl, 0.0)
    inv_eta = jnp.where(entering, 1.0 / ior, ior)
    trans = refract(outgoing, halfway, inv_eta)
    trans = jnp.where(_same_hemi(up, outgoing, trans)[..., None], 0.0, trans)
    return jnp.where(take_refl[..., None], refl, trans)


def sample_refractive_pdf(color, ior, roughness, normal, outgoing, incoming):
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    same = _same_hemi(normal, outgoing, incoming)
    hw_r = normalize(incoming + outgoing)
    doh_r = jnp.abs(dot(outgoing, hw_r))
    pdf_r = fresnel_dielectric(rel_ior, hw_r, outgoing) * sample_microfacet_pdf(
        roughness, up, hw_r
    ) / jnp.where(doh_r != 0.0, 4.0 * doh_r, 1.0)
    hw_t = -normalize(rel_ior[..., None] * incoming + outgoing) * jnp.where(
        entering[..., None], 1.0, -1.0
    )
    ihh = dot(incoming, hw_t)
    ohh = dot(outgoing, hw_t)
    jac_den = (rel_ior * ihh + ohh) ** 2
    pdf_t = (
        (1.0 - fresnel_dielectric(rel_ior, hw_t, outgoing))
        * sample_microfacet_pdf(roughness, up, hw_t)
        * jnp.abs(ihh) / jnp.where(jac_den != 0.0, jac_den, 1.0)
    )
    return jnp.where(same, pdf_r, pdf_t)


def eval_refractive_delta(color, ior, normal, outgoing, incoming):
    near_one = jnp.abs(ior - 1.0) < 1e-3
    opposite = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    pass_val = jnp.where(opposite, 1.0, 0.0)
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    f = fresnel_dielectric(rel_ior, up, outgoing)
    same = _same_hemi(normal, outgoing, incoming)
    val = jnp.where(same, f, (1.0 / (rel_ior * rel_ior)) * (1.0 - f))
    out = jnp.where(near_one, pass_val, val)
    return out[..., None] * jnp.ones(3, dtype=out.dtype)


def sample_refractive_delta(color, ior, normal, outgoing, rnl):
    near_one = jnp.abs(ior - 1.0) < 1e-3
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    take_refl = rnl < fresnel_dielectric(rel_ior, up, outgoing)
    out = jnp.where(
        take_refl[..., None],
        reflect(outgoing, up),
        refract(outgoing, up, 1.0 / rel_ior),
    )
    return jnp.where(near_one[..., None], -outgoing, out)


def sample_refractive_delta_pdf(color, ior, normal, outgoing, incoming):
    near_one = jnp.abs(ior - 1.0) < 1e-3
    opposite = dot(normal, incoming) * dot(normal, outgoing) < 0.0
    entering = dot(normal, outgoing) >= 0.0
    up = jnp.where(entering[..., None], normal, -normal)
    rel_ior = jnp.where(entering, ior, 1.0 / ior)
    f = fresnel_dielectric(rel_ior, up, outgoing)
    same = _same_hemi(normal, outgoing, incoming)
    val = jnp.where(same, f, 1.0 - f)
    return jnp.where(near_one, jnp.where(opposite, 1.0, 0.0), val)


# ---------------------------------------------------------------------------
# gltfpbr (yocto_shading.h:723-772)
# ---------------------------------------------------------------------------

def eval_gltfpbr(color, ior, roughness, metallic, normal, outgoing, incoming):
    refl0 = eta_to_reflectivity(jnp.broadcast_to(ior[..., None], color.shape))
    reflectivity = refl0 * (1.0 - metallic[..., None]) + color * metallic[..., None]
    up = _up_normal(normal, outgoing)
    f1 = fresnel_schlick(reflectivity, up, outgoing)
    halfway = normalize(incoming + outgoing)
    f = fresnel_schlick(reflectivity, halfway, incoming)
    d = microfacet_distribution(roughness, up, halfway)
    g = microfacet_shadowing(roughness, up, halfway, outgoing, incoming)
    ndi = dot(up, incoming)
    ndo = dot(up, outgoing)
    den = 4.0 * ndo * ndi
    diff = color * (1.0 - metallic[..., None]) * (1.0 - f1) / PIF * jnp.abs(ndi)[..., None]
    spec = f * (d * g / jnp.where(den != 0.0, den, 1.0) * jnp.abs(ndi))[..., None]
    bad = (dot(normal, incoming) * dot(normal, outgoing) <= 0.0)[..., None]
    return jnp.where(bad, 0.0, diff + spec)


def sample_gltfpbr(color, ior, roughness, metallic, normal, outgoing, rnl, rn):
    up = _up_normal(normal, outgoing)
    refl0 = eta_to_reflectivity(jnp.broadcast_to(ior[..., None], color.shape))
    reflectivity = refl0 * (1.0 - metallic[..., None]) + color * metallic[..., None]
    take_spec = rnl < jnp.mean(fresnel_schlick(reflectivity, up, outgoing), axis=-1)
    halfway = sample_microfacet(roughness, up, rn)
    refl = reflect(outgoing, halfway)
    refl = jnp.where(_same_hemi(up, outgoing, refl)[..., None], refl, 0.0)
    diff = sample_hemisphere_cos(up, rn)
    return jnp.where(take_spec[..., None], refl, diff)


def sample_gltfpbr_pdf(color, ior, roughness, metallic, normal, outgoing, incoming):
    up = _up_normal(normal, outgoing)
    halfway = normalize(outgoing + incoming)
    refl0 = eta_to_reflectivity(jnp.broadcast_to(ior[..., None], color.shape))
    reflectivity = refl0 * (1.0 - metallic[..., None]) + color * metallic[..., None]
    f = jnp.mean(fresnel_schlick(reflectivity, up, outgoing), axis=-1)
    doh = jnp.abs(dot(outgoing, halfway))
    pdf = f * sample_microfacet_pdf(roughness, up, halfway) / jnp.where(
        doh != 0.0, 4.0 * doh, 1.0
    ) + (1.0 - f) * sample_hemisphere_cos_pdf(up, incoming)
    bad = dot(normal, incoming) * dot(normal, outgoing) <= 0.0
    return jnp.where(bad, 0.0, pdf)


# ---------------------------------------------------------------------------
# passthrough (yocto_shading.h:1016-1039), used for volumetric delta boundary
# ---------------------------------------------------------------------------

def eval_passthrough(color, normal, outgoing, incoming):
    same = _same_hemi(normal, outgoing, incoming)[..., None]
    return jnp.where(same, 0.0, jnp.ones_like(color))


def sample_passthrough(color, normal, outgoing):
    return -outgoing


def sample_passthrough_pdf(color, normal, outgoing, incoming):
    same = _same_hemi(normal, outgoing, incoming)
    return jnp.where(same, 0.0, 1.0)


# ---------------------------------------------------------------------------
# dispatch (yocto_pathtrace.cpp:92-236): rough lobes keyed by type when
# roughness != 0; delta lobes when roughness == 0.
# ---------------------------------------------------------------------------

ALL_TYPES = frozenset(range(8))


def _onehot(m, t):
    return (m.mtype == t)[..., None]


def eval_bsdfcos(m: MaterialPoint, normal, outgoing, incoming,
                 types=ALL_TYPES):
    """`types`: static set of material-type codes present in the scene;
    lobes of absent types are skipped at trace time (big VPU savings)."""
    rough = (m.roughness != 0.0)[..., None]
    val = jnp.zeros_like(m.color)
    if MATTE in types:
        val = jnp.where(_onehot(m, MATTE), eval_matte(m.color, normal, outgoing, incoming), val)
    if GLOSSY in types:
        val = jnp.where(
            _onehot(m, GLOSSY),
            eval_glossy(m.color, m.ior, m.roughness, normal, outgoing, incoming), val)
    if REFLECTIVE in types:
        val = jnp.where(
            _onehot(m, REFLECTIVE),
            eval_reflective(m.color, m.roughness, normal, outgoing, incoming), val)
    if TRANSPARENT in types:
        val = jnp.where(
            _onehot(m, TRANSPARENT),
            eval_transparent(m.color, m.ior, m.roughness, normal, outgoing, incoming), val)
    if REFRACTIVE in types or SUBSURFACE in types:
        refr = eval_refractive(m.color, m.ior, m.roughness, normal, outgoing, incoming)
        val = jnp.where(_onehot(m, REFRACTIVE) | _onehot(m, SUBSURFACE), refr, val)
    if GLTFPBR in types:
        val = jnp.where(
            _onehot(m, GLTFPBR),
            eval_gltfpbr(m.color, m.ior, m.roughness, m.metallic, normal, outgoing, incoming),
            val)
    return jnp.where(rough, val, 0.0)


def sample_bsdfcos(m: MaterialPoint, normal, outgoing, rnl, rn,
                   types=ALL_TYPES):
    rough = (m.roughness != 0.0)[..., None]
    val = jnp.zeros_like(m.color)
    if MATTE in types:
        val = jnp.where(_onehot(m, MATTE), sample_matte(m.color, normal, outgoing, rn), val)
    if GLOSSY in types:
        val = jnp.where(
            _onehot(m, GLOSSY),
            sample_glossy(m.color, m.ior, m.roughness, normal, outgoing, rnl, rn), val)
    if REFLECTIVE in types:
        val = jnp.where(
            _onehot(m, REFLECTIVE),
            sample_reflective(m.color, m.roughness, normal, outgoing, rn), val)
    if TRANSPARENT in types:
        val = jnp.where(
            _onehot(m, TRANSPARENT),
            sample_transparent(m.color, m.ior, m.roughness, normal, outgoing, rnl, rn), val)
    if REFRACTIVE in types or SUBSURFACE in types:
        refr = sample_refractive(m.color, m.ior, m.roughness, normal, outgoing, rnl, rn)
        val = jnp.where(_onehot(m, REFRACTIVE) | _onehot(m, SUBSURFACE), refr, val)
    if GLTFPBR in types:
        val = jnp.where(
            _onehot(m, GLTFPBR),
            sample_gltfpbr(m.color, m.ior, m.roughness, m.metallic, normal, outgoing, rnl, rn),
            val)
    return jnp.where(rough, val, 0.0)


def sample_bsdfcos_pdf(m: MaterialPoint, normal, outgoing, incoming,
                       types=ALL_TYPES):
    rough = m.roughness != 0.0
    t = m.mtype
    pdf = jnp.zeros_like(m.roughness)
    if MATTE in types:
        pdf = jnp.where(t == MATTE, sample_matte_pdf(m.color, normal, outgoing, incoming), pdf)
    if GLOSSY in types:
        pdf = jnp.where(
            t == GLOSSY,
            sample_glossy_pdf(m.color, m.ior, m.roughness, normal, outgoing, incoming), pdf)
    if REFLECTIVE in types:
        pdf = jnp.where(
            t == REFLECTIVE,
            sample_reflective_pdf(m.color, m.roughness, normal, outgoing, incoming), pdf)
    if TRANSPARENT in types:
        pdf = jnp.where(
            t == TRANSPARENT,
            sample_transparent_pdf(m.color, m.ior, m.roughness, normal, outgoing, incoming), pdf)
    if REFRACTIVE in types or SUBSURFACE in types:
        refr = sample_refractive_pdf(m.color, m.ior, m.roughness, normal, outgoing, incoming)
        pdf = jnp.where((t == REFRACTIVE) | (t == SUBSURFACE), refr, pdf)
    if GLTFPBR in types:
        pdf = jnp.where(
            t == GLTFPBR,
            sample_gltfpbr_pdf(m.color, m.ior, m.roughness, m.metallic, normal, outgoing, incoming),
            pdf)
    return jnp.where(rough, pdf, 0.0)


def eval_delta(m: MaterialPoint, normal, outgoing, incoming,
               types=ALL_TYPES):
    delta = (m.roughness == 0.0)[..., None]
    val = jnp.zeros_like(m.color)
    if REFLECTIVE in types:
        val = jnp.where(
            _onehot(m, REFLECTIVE), eval_reflective_delta(m.color, normal, outgoing, incoming), val)
    if TRANSPARENT in types:
        val = jnp.where(
            _onehot(m, TRANSPARENT),
            eval_transparent_delta(m.color, m.ior, normal, outgoing, incoming), val)
    if REFRACTIVE in types:
        val = jnp.where(
            _onehot(m, REFRACTIVE),
            eval_refractive_delta(m.color, m.ior, normal, outgoing, incoming), val)
    if VOLUMETRIC in types:
        val = jnp.where(
            _onehot(m, VOLUMETRIC), eval_passthrough(m.color, normal, outgoing, incoming), val)
    return jnp.where(delta, val, 0.0)


def sample_delta(m: MaterialPoint, normal, outgoing, rnl,
                 types=ALL_TYPES):
    delta = (m.roughness == 0.0)[..., None]
    val = jnp.zeros_like(m.color)
    if REFLECTIVE in types:
        val = jnp.where(
            _onehot(m, REFLECTIVE), sample_reflective_delta(m.color, normal, outgoing), val)
    if TRANSPARENT in types:
        val = jnp.where(
            _onehot(m, TRANSPARENT),
            sample_transparent_delta(m.color, m.ior, normal, outgoing, rnl), val)
    if REFRACTIVE in types:
        val = jnp.where(
            _onehot(m, REFRACTIVE),
            sample_refractive_delta(m.color, m.ior, normal, outgoing, rnl), val)
    if VOLUMETRIC in types:
        val = jnp.where(
            _onehot(m, VOLUMETRIC),
            jnp.broadcast_to(sample_passthrough(m.color, normal, outgoing), val.shape), val)
    return jnp.where(delta, val, 0.0)


def sample_delta_pdf(m: MaterialPoint, normal, outgoing, incoming,
                     types=ALL_TYPES):
    delta = m.roughness == 0.0
    t = m.mtype
    pdf = jnp.zeros_like(m.roughness)
    if REFLECTIVE in types:
        pdf = jnp.where(
            t == REFLECTIVE, sample_reflective_delta_pdf(m.color, normal, outgoing, incoming), pdf)
    if TRANSPARENT in types:
        pdf = jnp.where(
            t == TRANSPARENT,
            sample_transparent_delta_pdf(m.color, m.ior, normal, outgoing, incoming), pdf)
    if REFRACTIVE in types:
        pdf = jnp.where(
            t == REFRACTIVE,
            sample_refractive_delta_pdf(m.color, m.ior, normal, outgoing, incoming), pdf)
    if VOLUMETRIC in types:
        pdf = jnp.where(
            t == VOLUMETRIC, sample_passthrough_pdf(m.color, normal, outgoing, incoming), pdf)
    return jnp.where(delta, pdf, 0.0)
