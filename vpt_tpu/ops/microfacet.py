"""Fresnel and GGX microfacet building blocks (batched, branchless).

Semantics mirror /root/reference/libs/yocto/yocto_shading.h:302-518 exactly,
rewritten with jnp.where masking instead of early returns so everything
vectorizes on the TPU VPU and differentiates cleanly.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import PIF, basis_apply, basis_fromz, dot


def fresnel_schlick(specular, normal, outgoing):
    cosine = dot(normal, outgoing)
    fac = jnp.clip(1.0 - jnp.abs(cosine), 0.0, 1.0) ** 5.0
    out = specular + (1.0 - specular) * fac[..., None]
    zero = jnp.all(specular == 0.0, axis=-1, keepdims=True)
    return jnp.where(zero, 0.0, out)


def fresnel_dielectric(eta, normal, outgoing):
    """Exact dielectric Fresnel; returns 1 on TIR (yocto_shading.h:311-331).
    The sqrt input is masked on the TIR branch: sqrt(0) has an infinite
    gradient that would leak NaN cotangents through the jnp.where."""
    cosw = jnp.abs(dot(normal, outgoing))
    sin2 = 1.0 - cosw * cosw
    eta2 = eta * eta
    cos2t = 1.0 - sin2 / eta2
    tir = cos2t < 0.0
    t0 = jnp.sqrt(jnp.where(tir, 1.0, jnp.maximum(cos2t, 1e-12)))
    t1 = eta * t0
    t2 = eta * cosw
    rs = (cosw - t1) / jnp.where(cosw + t1 != 0.0, cosw + t1, 1.0)
    rp = (t0 - t2) / jnp.where(t0 + t2 != 0.0, t0 + t2, 1.0)
    return jnp.where(tir, 1.0, (rs * rs + rp * rp) / 2.0)


def fresnel_conductor(eta, etak, normal, outgoing):
    """Conductor Fresnel (yocto_shading.h:334-359); zero when cosw <= 0."""
    cosw_raw = dot(normal, outgoing)
    cosw = jnp.clip(cosw_raw, -1.0, 1.0)[..., None]
    cos2 = cosw * cosw
    sin2 = jnp.clip(1.0 - cos2, 0.0, 1.0)
    eta2 = eta * eta
    etak2 = etak * etak
    t0 = eta2 - etak2 - sin2
    a2plusb2 = jnp.sqrt(jnp.maximum(t0 * t0 + 4.0 * eta2 * etak2, 0.0))
    t1 = a2plusb2 + cos2
    a = jnp.sqrt(jnp.maximum((a2plusb2 + t0) / 2.0, 0.0))
    t2 = 2.0 * a * cosw
    rs = (t1 - t2) / jnp.where(t1 + t2 != 0.0, t1 + t2, 1.0)
    t3 = cos2 * a2plusb2 + sin2 * sin2
    t4 = t2 * sin2
    rp = rs * (t3 - t4) / jnp.where(t3 + t4 != 0.0, t3 + t4, 1.0)
    out = (rp + rs) / 2.0
    return jnp.where((cosw_raw <= 0.0)[..., None], 0.0, out)


def eta_to_reflectivity(eta):
    return ((eta - 1.0) ** 2) / ((eta + 1.0) ** 2)


def reflectivity_to_eta(reflectivity):
    # floor at 1e-6: sqrt(0) has infinite gradient and this runs (masked) for
    # every material in the branchless dispatch
    r = jnp.clip(reflectivity, 1e-6, 0.99)
    return (1.0 + jnp.sqrt(r)) / (1.0 - jnp.sqrt(r))


def microfacet_distribution(roughness, normal, halfway):
    """GGX NDF (yocto_shading.h:402-417, ggx branch)."""
    cosine = dot(normal, halfway)
    r2 = roughness * roughness
    c2 = cosine * cosine
    denom = c2 * r2 + 1.0 - c2
    d = r2 / (PIF * denom * denom)
    return jnp.where(cosine <= 0.0, 0.0, d)


def microfacet_shadowing1(roughness, normal, halfway, direction):
    cosine = dot(normal, direction)
    cosineh = dot(halfway, direction)
    r2 = roughness * roughness
    c2 = cosine * cosine
    g = 2.0 * jnp.abs(cosine) / (
        jnp.abs(cosine) + jnp.sqrt(jnp.maximum(c2 - r2 * c2 + r2, 1e-12))
    )
    return jnp.where(cosine * cosineh <= 0.0, 0.0, g)


def microfacet_shadowing(roughness, normal, halfway, outgoing, incoming):
    return microfacet_shadowing1(roughness, normal, halfway, outgoing) * \
        microfacet_shadowing1(roughness, normal, halfway, incoming)


def sample_microfacet(roughness, normal, rn):
    """Sample the GGX NDF (yocto_shading.h:450-463, ggx branch)."""
    phi = 2.0 * PIF * rn[..., 0]
    theta = jnp.arctan(roughness * jnp.sqrt(rn[..., 1] / jnp.maximum(1.0 - rn[..., 1], 1e-12)))
    st = jnp.sin(theta)
    local = jnp.stack([jnp.cos(phi) * st, jnp.sin(phi) * st, jnp.cos(theta)], axis=-1)
    return basis_apply(basis_fromz(normal), local)


def sample_microfacet_pdf(roughness, normal, halfway):
    cosine = dot(normal, halfway)
    return jnp.where(
        cosine < 0.0, 0.0, microfacet_distribution(roughness, normal, halfway) * cosine
    )
