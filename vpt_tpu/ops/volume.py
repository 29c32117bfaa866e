"""Homogeneous-medium transmittance and Henyey-Greenstein phase function.

Mirrors yocto_shading.h:1047-1102 and the phase dispatch of
yocto_pathtrace.cpp:238-255, batched and differentiable w.r.t. density,
scattering albedo and anisotropy. Distance sampling is written in
reparameterized form: the sampled distance is an explicit function of the
uniform draw and the density, so gradients flow through `-log(1-u)/sigma`.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import FLT_MAX, PIF, basis_apply, basis_fromz, dot


def _exp_neg(x):
    # bounded exponent: exp(-x) with x clipped to [0, 80] — unbounded products
    # (sigma * FLT_MAX-ish distances in masked branches) otherwise leak
    # inf/NaN cotangents through XLA-fused vjps
    return jnp.exp(-jnp.clip(x, 0.0, 80.0))


def eval_transmittance(density, distance):
    return _exp_neg(density * distance[..., None])


def sample_transmittance(density, max_distance, rl, rd):
    """Channel-uniform distance sampling (yocto_shading.h:1052-1058)."""
    channel = jnp.clip((rl * 3.0).astype(jnp.int32), 0, 2)
    # one-hot select instead of take_along_axis: the (R,)-indexed gather was
    # a measurable sink (~3 ms/step in the round-3 trace); the select is free
    oh = (channel[..., None] == jnp.arange(3, dtype=channel.dtype)).astype(
        density.dtype)
    sigma = jnp.sum(density * oh, axis=-1)
    dist = jnp.where(
        sigma == 0.0,
        FLT_MAX,
        -jnp.log1p(-rd) / jnp.where(sigma == 0.0, 1.0, sigma),
    )
    return jnp.minimum(dist, max_distance)


def sample_transmittance_pdf(density, distance, max_distance):
    inside = distance < max_distance
    pdf_in = jnp.sum(density * _exp_neg(density * distance[..., None]), axis=-1) / 3.0
    pdf_out = jnp.sum(_exp_neg(density * max_distance[..., None]), axis=-1) / 3.0
    return jnp.where(inside, pdf_in, pdf_out)


def eval_phasefunction(anisotropy, outgoing, incoming):
    cosine = -dot(outgoing, incoming)
    denom = 1.0 + anisotropy * anisotropy - 2.0 * anisotropy * cosine
    denom = jnp.maximum(denom, 1e-12)
    return (1.0 - anisotropy * anisotropy) / (4.0 * PIF * denom * jnp.sqrt(denom))


def sample_phasefunction(anisotropy, outgoing, rn):
    iso = jnp.abs(anisotropy) < 1e-3
    cos_iso = 1.0 - 2.0 * rn[..., 1]
    g = jnp.where(iso, 0.5, anisotropy)  # dummy g where iso to avoid div-by-0
    square = (1.0 - g * g) / (1.0 + g - 2.0 * g * rn[..., 1])
    cos_aniso = (1.0 + g * g - square * square) / (2.0 * g)
    cos_theta = jnp.where(iso, cos_iso, cos_aniso)
    sin_theta = jnp.sqrt(jnp.maximum(1e-12, 1.0 - cos_theta * cos_theta))
    phi = 2.0 * PIF * rn[..., 0]
    local = jnp.stack(
        [sin_theta * jnp.cos(phi), sin_theta * jnp.sin(phi), cos_theta], axis=-1
    )
    return basis_apply(basis_fromz(-outgoing), local)


def sample_phasefunction_pdf(anisotropy, outgoing, incoming):
    return eval_phasefunction(anisotropy, outgoing, incoming)


def eval_scattering(density, scattering, anisotropy, outgoing, incoming):
    """yocto_pathtrace.cpp:238-243: sigma_s * HG."""
    return density * scattering * eval_phasefunction(anisotropy, outgoing, incoming)[..., None]
