"""Batched physical camera ray generation.

Mirrors eval_camera (/root/reference/libs/yocto/yocto_scene.cpp:67-102): film
size from aspect, thin-lens with aperture/focus, orthographic branch.
"""

from __future__ import annotations

import jax.numpy as jnp

from ..core.vecmath import normalize, transform_direction, transform_point


def eval_camera(frame, lens, film, aspect, focus, aperture, ortho,
                image_uv, lens_uv):
    """frame (4,3); scalars; image_uv/lens_uv (..., 2). Returns (o, d)."""
    film_x = jnp.where(aspect >= 1, film, film * aspect)
    film_y = jnp.where(aspect >= 1, film / aspect, film)

    # perspective
    qx = film_x * (0.5 - image_uv[..., 0])
    qy = film_y * (image_uv[..., 1] - 0.5)
    q = jnp.stack([qx, qy, jnp.broadcast_to(lens, qx.shape)], axis=-1)
    dc = -normalize(q)
    e = jnp.stack(
        [lens_uv[..., 0] * aperture / 2, lens_uv[..., 1] * aperture / 2,
         jnp.zeros_like(qx)], axis=-1)
    p = dc * (focus / jnp.abs(dc[..., 2]))[..., None]
    d = normalize(p - e)

    # orthographic
    scale = 1.0 / lens
    qxo = film_x * (0.5 - image_uv[..., 0]) * scale
    qyo = film_y * (image_uv[..., 1] - 0.5) * scale
    e_o = jnp.stack(
        [-qxo + lens_uv[..., 0] * aperture / 2,
         -qyo + lens_uv[..., 1] * aperture / 2,
         jnp.zeros_like(qx)], axis=-1)
    p_o = jnp.stack([-qxo, -qyo, jnp.full_like(qx, -focus)], axis=-1)
    d_o = normalize(p_o - e_o)

    is_ortho = ortho != 0
    e_sel = jnp.where(is_ortho, e_o, e)
    d_sel = jnp.where(is_ortho, d_o, d)
    return transform_point(frame, e_sel), transform_direction(frame, d_sel)
