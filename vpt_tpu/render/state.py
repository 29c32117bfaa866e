"""Progressive render state and the per-sample driver.

Mirrors pathtrace_state / make_state / pathtrace_samples / get_render
(/root/reference/libs/yocto_pathtrace/yocto_pathtrace.cpp:960-1116) in
functional form: the accumulation buffer is a pytree and each call to
`render_sample` adds one sample per pixel. With counter-based RNG the whole
state is (accum rgba, spp) — serializable as a checkpoint (SURVEY.md §5) and
shardable over the pixel axis for multi-chip renders.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core import rng
from .camera import eval_camera


class RenderState(NamedTuple):
    accum: jnp.ndarray   # (H*W, 4) radiance+alpha accumulation
    samples: jnp.ndarray  # () int32


def image_size(cam_aspect: float, resolution: int):
    """make_state sizing (cpp:964-970)."""
    if cam_aspect >= 1:
        return resolution, int(round(resolution / cam_aspect))
    return int(round(resolution * cam_aspect)), resolution


def make_state(width: int, height: int) -> RenderState:
    return RenderState(
        accum=jnp.zeros((width * height, 4), jnp.float32),
        samples=jnp.int32(0),
    )


def camera_rays(ds, camera_id, width, height, pixel_ids, sample_id,
                total_samples: int, seed: int = 1301081):
    """Stratified-jittered primary rays (cpp:1059-1085): center of pixel when
    total_samples == 1, else uniform jitter; lens uv always random."""
    i = (pixel_ids % width).astype(jnp.float32)
    j = (pixel_ids // width).astype(jnp.float32)
    if total_samples == 1:
        ju = jnp.full_like(i, 0.5)
        jv = jnp.full_like(i, 0.5)
    else:
        ju = rng.uniform_float(pixel_ids, sample_id, 0, seed)
        jv = rng.uniform_float(pixel_ids, sample_id, 1, seed)
    u = (i + ju) / width
    v = (j + jv) / height
    luv = jnp.stack(
        [rng.uniform_float(pixel_ids, sample_id, 2, seed),
         rng.uniform_float(pixel_ids, sample_id, 3, seed)], axis=-1)
    image_uv = jnp.stack([u, v], axis=-1)
    c = camera_id
    return eval_camera(
        ds.cam_frame[c], ds.cam_lens[c], ds.cam_film[c], ds.cam_aspect[c],
        ds.cam_focus[c], ds.cam_aperture[c], ds.cam_ortho[c], image_uv, luv)


def render_sample(shade_fn, ds, state: RenderState, camera_id, width, height,
                  total_samples: int, seed: int = 1301081):
    """One progressive sample over all pixels; returns updated state."""
    pixel_ids = jnp.arange(width * height, dtype=jnp.uint32)
    sample_id = state.samples
    o, d = camera_rays(ds, camera_id, width, height, pixel_ids, sample_id,
                       total_samples, seed)
    radiance, alpha = shade_fn(o, d, pixel_ids, sample_id)
    rgba = jnp.concatenate([radiance, alpha[..., None]], axis=-1)
    return RenderState(accum=state.accum + rgba, samples=state.samples + 1)


def get_render(state: RenderState):
    """Linear mean image (H*W, 4)."""
    scale = 1.0 / jnp.maximum(state.samples.astype(jnp.float32), 1.0)
    return state.accum * scale


def linear_to_srgb(x):
    x = jnp.clip(x, 0.0, 1.0)
    return jnp.where(x <= 0.0031308, 12.92 * x, 1.055 * x ** (1 / 2.4) - 0.055)


def tonemap(rgba, exposure: float = 0.0, filmic: bool = False, srgb: bool = True):
    """yocto tonemap (yocto_color.h:306-318): exposure scale, optional ACES
    filmic approximation, sRGB encode. Alpha passes through."""
    rgb = rgba[..., :3]
    if exposure != 0:
        rgb = rgb * (2.0 ** exposure)
    if filmic:
        h = rgb * 0.6
        rgb = jnp.maximum(
            0.0, (h * h * 2.51 + h * 0.03) / (h * h * 2.43 + h * 0.59 + 0.14))
    if srgb:
        rgb = linear_to_srgb(rgb)
    return jnp.concatenate([rgb, rgba[..., 3:]], axis=-1)
