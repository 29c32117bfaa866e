"""Batched Monte Carlo samplers mirroring yocto_sampling.h semantics.

Each function is fully vectorized over leading batch axes; random inputs are
passed explicitly (drawn from vpt_tpu.core.rng), keeping everything pure and
jit/grad friendly. Reference: /root/reference/libs/yocto/yocto_sampling.h:249-395.
"""

from __future__ import annotations

import jax.numpy as jnp

from .vecmath import PIF, basis_apply, basis_fromz


def sample_hemisphere(normal, ruv):
    z = ruv[..., 1]
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * PIF * ruv[..., 0]
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return basis_apply(basis_fromz(normal), local)


def sample_hemisphere_pdf(normal, direction):
    cosw = jnp.sum(normal * direction, axis=-1)
    return jnp.where(cosw <= 0.0, 0.0, 1.0 / (2.0 * PIF))


def sample_sphere(ruv):
    z = 2.0 * ruv[..., 1] - 1.0
    r = jnp.sqrt(jnp.clip(1.0 - z * z, 0.0, 1.0))
    phi = 2.0 * PIF * ruv[..., 0]
    return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)


def sample_sphere_pdf():
    return 1.0 / (4.0 * PIF)


def sample_hemisphere_cos(normal, ruv):
    z = jnp.sqrt(ruv[..., 1])
    r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
    phi = 2.0 * PIF * ruv[..., 0]
    local = jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)
    return basis_apply(basis_fromz(normal), local)


def sample_hemisphere_cos_pdf(normal, direction):
    cosw = jnp.sum(normal * direction, axis=-1)
    return jnp.where(cosw <= 0.0, 0.0, cosw / PIF)


def sample_disk(ruv):
    r = jnp.sqrt(ruv[..., 1])
    phi = 2.0 * PIF * ruv[..., 0]
    return jnp.stack([jnp.cos(phi) * r, jnp.sin(phi) * r], axis=-1)


def sample_triangle_uv(ruv):
    """Barycentric square-root warp (yocto_sampling.h:351)."""
    sq = jnp.sqrt(ruv[..., 0])
    return jnp.stack([1.0 - sq, ruv[..., 1] * sq], axis=-1)


def sample_uniform_index(size, r):
    """Uniform index in [0, size); size may be traced."""
    idx = (r * size).astype(jnp.int32)
    return jnp.clip(idx, 0, size - 1)


def sample_discrete(cdf, r, total=None):
    """Draw an index from an (unnormalized, inclusive) CDF along the last axis.

    Mirrors yocto sample_discrete (yocto_sampling.h:385-390): scale r by
    cdf[-1], clamp just below the top, then upper_bound.
    cdf: (..., N) inclusive prefix sums. r: (...) uniforms.
    """
    if total is None:
        total = cdf[..., -1]
    rs = jnp.clip(r * total, 0.0, total - 1e-5)
    idx = jnp.sum((cdf <= rs[..., None]).astype(jnp.int32), axis=-1)
    return jnp.clip(idx, 0, cdf.shape[-1] - 1)


def sample_discrete_pdf(cdf, idx):
    """Unnormalized mass of element idx: cdf[idx] - cdf[idx-1]."""
    hi = jnp.take_along_axis(cdf, idx[..., None], axis=-1)[..., 0]
    lo = jnp.where(
        idx > 0,
        jnp.take_along_axis(cdf, jnp.maximum(idx - 1, 0)[..., None], axis=-1)[..., 0],
        0.0,
    )
    return hi - lo
