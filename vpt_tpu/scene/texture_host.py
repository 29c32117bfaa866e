"""Host-side (numpy) texture evaluation, used by load-time displacement
mapping. Mirrors eval_texture (/root/reference/libs/yocto/yocto_scene.cpp:128-161):
wrap by default, bilinear, optional srgb->linear decode for byte textures."""

from __future__ import annotations

import numpy as np

from .image_io import srgb_to_linear


def eval_texture_host(texture, uv: np.ndarray, as_linear: bool = False):
    """texture: schema.Texture; uv: (N, 2). Returns (N, 4) float32."""
    w, h = texture.width, texture.height
    if w == 0 or h == 0:
        return np.zeros((uv.shape[0], 4), np.float32)
    s = np.mod(uv[:, 0], 1.0) * w
    t = np.mod(uv[:, 1], 1.0) * h
    i = np.clip(s.astype(np.int64), 0, w - 1)
    j = np.clip(t.astype(np.int64), 0, h - 1)
    ii = (i + 1) % w
    jj = (j + 1) % h
    u = (s - i).astype(np.float32)[:, None]
    v = (t - j).astype(np.float32)[:, None]
    px = texture.pixels

    def look(jy, ix):
        c = px[jy, ix].astype(np.float32)
        if as_linear and not texture.linear:
            c = np.concatenate([srgb_to_linear(c[:, :3]), c[:, 3:]], axis=-1)
        return c

    return (
        look(j, i) * (1 - u) * (1 - v)
        + look(jj, i) * (1 - u) * v
        + look(j, ii) * u * (1 - v)
        + look(jj, ii) * u * v
    )
