"""Device-side texture evaluation over the flattened texel buffer.

Mirrors eval_texture (/root/reference/libs/yocto/yocto_scene.cpp:128-169):
wrap addressing, per-texel srgb->linear decode when `as_linear` and the
texture is byte-typed (non-linear), THEN bilinear blend — decode-before-blend
order matters for parity. Texture metadata (offset/width/height/linear) is
passed as device arrays indexed by texture id; id < 0 returns (1,1,1,1).
"""

from __future__ import annotations

import jax.numpy as jnp


def _srgb_to_linear(x):
    return jnp.where(x <= 0.04045, x / 12.92, ((x + 0.055) / 1.055) ** 2.4)


def eval_texture(tex_pixels, tex_offset, tex_width, tex_height, tex_linear,
                 tex_id, uv, as_linear: bool, no_interpolation: bool = False):
    """tex_id: (...,) int32 (may be -1); uv: (..., 2). Returns (..., 4)."""
    tid = jnp.maximum(tex_id, 0)
    w = tex_width[tid]
    h = tex_height[tid]
    off = tex_offset[tid]
    lin = tex_linear[tid] == 1

    s = jnp.mod(uv[..., 0], 1.0) * w
    t = jnp.mod(uv[..., 1], 1.0) * h
    s = jnp.where(s < 0, s + w, s)
    t = jnp.where(t < 0, t + h, t)
    i = jnp.clip(s.astype(jnp.int32), 0, w - 1)
    j = jnp.clip(t.astype(jnp.int32), 0, h - 1)
    ii = jnp.where(i + 1 >= w, 0, i + 1)  # (i+1) % w
    jj = jnp.where(j + 1 >= h, 0, j + 1)
    u = (s - i)[..., None]
    v = (t - j)[..., None]

    def look(jy, ix):
        c = tex_pixels[off + jy * w + ix]
        if as_linear:
            rgb = jnp.where(lin[..., None], c[..., :3], _srgb_to_linear(c[..., :3]))
            c = jnp.concatenate([rgb, c[..., 3:]], axis=-1)
        return c

    if no_interpolation:
        out = look(j, i)
    else:
        out = (
            look(j, i) * (1 - u) * (1 - v)
            + look(jj, i) * (1 - u) * v
            + look(j, ii) * u * (1 - v)
            + look(jj, ii) * u * v
        )
    return jnp.where((tex_id < 0)[..., None], 1.0, out)


def _decode(c, lin, as_linear: bool):
    """sRGB decode before blend (parity: yocto decodes per texel). lin may
    be a per-ray bool array, a static python bool, or None (= linear)."""
    if not as_linear or lin is None or lin is True:
        return c
    if lin is False:
        rgb = _srgb_to_linear(c[..., :3])
        return jnp.concatenate([rgb, c[..., 3:]], axis=-1)
    rgb = jnp.where(lin[..., None], c[..., :3], _srgb_to_linear(c[..., :3]))
    return jnp.concatenate([rgb, c[..., 3:]], axis=-1)


def eval_texture_meta(tex_pixels, tex_pixels_pair, off, w, h, lin, uv,
                      as_linear: bool):
    """Bilinear texture eval from explicit metadata instead of texture-id
    gathers (round-4 gather-count reduction, PERF.md):

    - off/w/h may be per-ray int32 arrays (one-hot material meta) or python
      ints (static environment texture) — the python-int case folds all
      addressing into constants;
    - with the pair-packed atlas (scene/flatten.py tex_pixels_pair) each
      bilinear needs 2 row gathers instead of 4 taps;
    - off < 0 marks unbound -> returns (1,1,1,1) like eval_texture.

    Semantics match eval_texture (wrap addressing, decode-before-blend,
    yocto_scene.cpp:128-169)."""
    s = jnp.mod(uv[..., 0], 1.0) * w
    t = jnp.mod(uv[..., 1], 1.0) * h
    s = jnp.where(s < 0, s + w, s)
    t = jnp.where(t < 0, t + h, t)
    i = jnp.clip(s.astype(jnp.int32), 0, w - 1)
    j = jnp.clip(t.astype(jnp.int32), 0, h - 1)
    jj = jnp.where(j + 1 >= h, 0, j + 1)
    u = (s - i)[..., None]
    v = (t - j)[..., None]
    if tex_pixels_pair is not None:
        p0 = jnp.take(tex_pixels_pair, off + j * w + i, axis=0, mode="clip")
        p1 = jnp.take(tex_pixels_pair, off + jj * w + i, axis=0, mode="clip")
        c00, c10 = p0[..., 0:4], p0[..., 4:8]
        c01, c11 = p1[..., 0:4], p1[..., 4:8]
    else:
        ii = jnp.where(i + 1 >= w, 0, i + 1)
        c00 = jnp.take(tex_pixels, off + j * w + i, axis=0, mode="clip")
        c10 = jnp.take(tex_pixels, off + j * w + ii, axis=0, mode="clip")
        c01 = jnp.take(tex_pixels, off + jj * w + i, axis=0, mode="clip")
        c11 = jnp.take(tex_pixels, off + jj * w + ii, axis=0, mode="clip")
    out = (
        _decode(c00, lin, as_linear) * (1 - u) * (1 - v)
        + _decode(c01, lin, as_linear) * (1 - u) * v
        + _decode(c10, lin, as_linear) * u * (1 - v)
        + _decode(c11, lin, as_linear) * u * v
    )
    if isinstance(off, int):
        return out if off >= 0 else jnp.ones_like(out)
    return jnp.where((off < 0)[..., None], 1.0, out)


def lookup_texel(tex_pixels, tex_offset, tex_width, tex_height, tex_id, i, j):
    """Raw texel access (lookup_texture without srgb handling for float use)."""
    tid = jnp.maximum(tex_id, 0)
    off = tex_offset[tid]
    w = tex_width[tid]
    return tex_pixels[off + j * w + i]
