"""Light sampling: area-CDF mesh lights, environment texel CDFs, SDF rect
lights.

Mirrors sample_lights / sample_lights_pdf
(/root/reference/libs/yocto_pathtrace/yocto_pathtrace.cpp:312-421) with two
TPU-first changes:
  - lights are a *static* (compile-time) list, so the per-light switch
    unrolls into masked selects — no data-dependent branching;
  - the reference's sequential occluder walk (<=100 dependent BVH re-casts
    per area light, cpp:363-378) is replaced by one vectorized all-hits pass
    over the light's own triangles, which finds the identical hit set (every
    surface of the light mesh along the ray) without the loop.
Quad lights were split into triangles with an area-proportional CDF; for the
parallelogram lights in the test scenes this sampling distribution is
identical to the reference's bilinear-uv quad sampling.
"""

from __future__ import annotations

from dataclasses import dataclass

import jax
import jax.numpy as jnp
import numpy as np

from ..core.sampling import sample_discrete, sample_triangle_uv
from ..core.vecmath import (
    PIF,
    cross,
    distance_squared,
    dot,
    frame_inverse,
    interpolate_triangle,
    normalize,
    transform_direction,
    transform_point,
)
from ..ops.intersect import intersect_triangles_one

KIND_INSTANCE, KIND_ENV, KIND_SDF = 0, 1, 2


@dataclass(frozen=True)
class StaticLight:
    kind: int
    id: int           # instance / environment / sdf index
    tri_lo: int = 0   # slice into ds.light_tris (instance lights)
    tri_hi: int = 0
    cdf_lo: int = 0   # slice into ds.light_cdf
    cdf_hi: int = 0
    env_w: int = 0    # env texture dims (env lights with a texture)
    env_h: int = 0
    env_tex: int = -1
    bvh_slot: int = -1  # ds.light_bvhs index for large mesh emitters


def build_lights_static(sa) -> list:
    """Build the static light list from host-side SceneArrays (numpy)."""
    out = []
    t_cursor = 0
    for li in range(len(sa.light_kind)):
        kind = int(sa.light_kind[li])
        lid = int(sa.light_id[li])
        if kind == KIND_INSTANCE:
            cnt = int(sa.light_tri_count[li])
            out.append(
                StaticLight(
                    kind=kind, id=lid,
                    tri_lo=t_cursor, tri_hi=t_cursor + cnt,
                    cdf_lo=int(sa.light_cdf_offset[li]),
                    cdf_hi=int(sa.light_cdf_offset[li] + sa.light_cdf_count[li]),
                    bvh_slot=int(sa.light_bvh_slot[li]),
                )
            )
            t_cursor += cnt
        elif kind == KIND_ENV:
            tex = int(sa.env_tex[lid])
            w = int(sa.tex_width[tex]) if tex >= 0 else 0
            h = int(sa.tex_height[tex]) if tex >= 0 else 0
            out.append(
                StaticLight(
                    kind=kind, id=lid,
                    cdf_lo=int(sa.light_cdf_offset[li]),
                    cdf_hi=int(sa.light_cdf_offset[li] + sa.light_cdf_count[li]),
                    env_w=w, env_h=h, env_tex=tex,
                )
            )
        else:
            out.append(
                StaticLight(
                    kind=kind, id=lid,
                    cdf_lo=int(sa.light_cdf_offset[li]),
                    cdf_hi=int(sa.light_cdf_offset[li] + sa.light_cdf_count[li]),
                )
            )
    return out


def _alias_pick(ds, light, r, accept):
    """O(1) categorical draw from light's alias table (core/alias.py):
    r selects the column, `accept` decides keep-vs-redirect. Reproduces the
    CDF's distribution exactly; replaces searchsorted over per-texel CDFs.
    Uses the packed [cut, idx] rows when available (one gather per draw,
    PERF.md round-4)."""
    n = light.cdf_hi - light.cdf_lo
    i = jnp.clip((r * n).astype(jnp.int32), 0, n - 1)
    pack = getattr(ds, "light_alias_pack", None)
    if pack is not None:
        row = jnp.take(pack, light.cdf_lo + i, axis=0, mode="clip")
        cut = row[..., 0]
        ai = jnp.round(row[..., 1]).astype(jnp.int32)
    else:
        cut = ds.light_alias_cut[light.cdf_lo + i]
        ai = ds.light_alias_idx[light.cdf_lo + i]
    return jnp.where(accept < cut, i, ai)


def _accept_bit(light, rel, ruv, racc):
    """Accept uniform for the alias draw: dedicated when provided; else the
    instance branch reuses frac(rel*n) (ample below ~2^14 elements) and the
    env branch uses ruv[...,0] (unused there — rel*n at n~2M leaves too few
    fraction bits)."""
    if light.kind != KIND_INSTANCE:
        return ruv[..., 0]
    if racc is not None:
        return racc
    n = light.cdf_hi - light.cdf_lo
    x = jnp.clip(rel * n, 0.0, n - 1e-4)
    return x - jnp.floor(x)


def sample_lights(ds, lights, position, rl, rel, ruv, racc=None):
    """Direction toward a uniformly-chosen light (cpp:312-350).

    Exactly one light applies per ray, so the alias-table rows of ALL
    alias-sampled lights merge into ONE gather (offsets selected by the
    light id), and all instance lights share ONE light_tris gather —
    2 total gathers where the per-light loop paid 2 per light (round-4
    gather-count reduction).

    racc: dedicated uniform for the alias-table accept bit (see
    _accept_bit)."""
    L = len(lights)
    if L == 0:
        return jnp.zeros_like(position)
    lid = jnp.clip((rl * L).astype(jnp.int32), 0, L - 1)
    out = jnp.zeros_like(position)

    pack = getattr(ds, "light_alias_pack", None)
    alias_ks = [k for k, l in enumerate(lights)
                if l.kind == KIND_INSTANCE
                or (l.kind == KIND_ENV and l.env_tex >= 0)]
    elem_all = None
    if pack is not None and alias_ks:
        sh = position.shape[:-1]
        gidx = jnp.zeros(sh, jnp.int32)
        isel = jnp.zeros(sh, jnp.int32)
        acc = jnp.zeros(sh, position.dtype)
        for k in alias_ks:
            light = lights[k]
            sel = lid == k
            n = light.cdf_hi - light.cdf_lo
            i = jnp.clip((rel * n).astype(jnp.int32), 0, n - 1)
            gidx = jnp.where(sel, light.cdf_lo + i, gidx)
            isel = jnp.where(sel, i, isel)
            acc = jnp.where(sel, _accept_bit(light, rel, ruv, racc), acc)
        row = jnp.take(pack, gidx, axis=0, mode="clip")
        elem_all = jnp.where(acc < row[..., 0], isel,
                             jnp.round(row[..., 1]).astype(jnp.int32))

    # instance lights: select the triangle row per ray, gather once
    inst_ks = [k for k, l in enumerate(lights) if l.kind == KIND_INSTANCE]
    if inst_ks:
        tri_row = jnp.zeros(position.shape[:-1], jnp.int32)
        inst_sel = jnp.zeros(position.shape[:-1], bool)
        for k in inst_ks:
            light = lights[k]
            sel = lid == k
            elem = elem_all if elem_all is not None else _alias_pick(
                ds, light, rel, _accept_bit(light, rel, ruv, racc))
            tri_row = jnp.where(sel, light.tri_lo + elem, tri_row)
            inst_sel = inst_sel | sel
        v = jnp.take(ds.light_tris, tri_row, axis=0, mode="clip")
        uv = sample_triangle_uv(ruv)
        lpos = interpolate_triangle(v[..., 0, :], v[..., 1, :], v[..., 2, :], uv)
        out = jnp.where(inst_sel[..., None], normalize(lpos - position), out)

    for k, light in enumerate(lights):
        if light.kind == KIND_INSTANCE:
            continue
        sel = (lid == k)[..., None]
        if light.kind == KIND_ENV and light.env_tex >= 0:
            # texel draw over the (w*h)-entry luminance CDF
            idx = elem_all if elem_all is not None else _alias_pick(
                ds, light, rel, ruv[..., 0])
            w, h = light.env_w, light.env_h
            u = ((idx % w).astype(jnp.float32) + 0.5) / w
            vcoord = ((idx // w).astype(jnp.float32) + 0.5) / h
            local = jnp.stack(
                [
                    jnp.cos(u * 2 * PIF) * jnp.sin(vcoord * PIF),
                    jnp.cos(vcoord * PIF),
                    jnp.sin(u * 2 * PIF) * jnp.sin(vcoord * PIF),
                ],
                axis=-1,
            )
            d = transform_direction(ds.env_frame[light.id], local)
        elif light.kind == KIND_ENV:
            # textureless environment: uniform sphere
            z = 2 * ruv[..., 1] - 1
            rr = jnp.sqrt(jnp.clip(1 - z * z, 0.0, 1.0))
            phi = 2 * PIF * ruv[..., 0]
            d = jnp.stack([rr * jnp.cos(phi), rr * jnp.sin(phi), z], axis=-1)
        else:  # KIND_SDF: flat rect at local z=1*whd.z (cpp:327-332)
            whd = ds.sdf_whd[light.id]
            lp = jnp.stack(
                [ruv[..., 0] * whd[0], ruv[..., 1] * whd[1],
                 jnp.ones_like(ruv[..., 0]) * whd[2]], axis=-1
            )
            wl = transform_point(frame_inverse(ds.sdf_frame[light.id]), lp)
            d = normalize(wl - position)
        out = jnp.where(sel, d, out)
    return out


def sample_lights_pdf(ds, lights, position, direction, spheretrace_fn=None):
    """Solid-angle pdf summed over all lights (cpp:353-421).

    spheretrace_fn(position, direction, sdf_id) -> (hit, dist, normal) is
    injected by the implicit integrator for SDF lights; None skips them.
    """
    L = len(lights)
    if L == 0:
        return jnp.zeros(position.shape[:-1], position.dtype)
    pdf = jnp.zeros(position.shape[:-1], position.dtype)
    for light in lights:
        if light.kind == KIND_INSTANCE and light.bvh_slot >= 0:
            # large mesh emitter: bounded all-hits BVH walk instead of the
            # O(rays x triangles) sweep (ops/bvh.py light_pdf_bvh)
            from ..ops.bvh import light_pdf_bvh

            area = ds.light_cdf[light.cdf_hi - 1]
            acc = light_pdf_bvh(
                ds.light_bvhs[light.bvh_slot], position, direction)
            pdf = pdf + acc / jnp.maximum(area, 1e-12)
        elif light.kind == KIND_INSTANCE:
            v = ds.light_tris[light.tri_lo:light.tri_hi]  # (K, 3, 3)
            area = ds.light_cdf[light.cdf_hi - 1]
            t, _, hit = intersect_triangles_one(
                position[..., None, :], direction[..., None, :],
                v[..., 0, :], v[..., 1, :], v[..., 2, :], 1e-4, jnp.inf,
            )
            gn = normalize(
                cross(v[..., 1, :] - v[..., 0, :], v[..., 2, :] - v[..., 0, :])
            )
            cosw = jnp.abs(jnp.sum(gn * direction[..., None, :], axis=-1))
            # mask missed-hit distances (FLT_MAX) before squaring: the
            # unselected where-branch would leak inf/NaN cotangents
            t_safe = jnp.where(hit, t, 1.0)
            lpos = position[..., None, :] + direction[..., None, :] * t_safe[..., None]
            d2 = distance_squared(lpos, position[..., None, :])
            contrib = jnp.where(
                hit & (cosw > 1e-12), d2 / jnp.where(cosw > 1e-12, cosw * area, 1.0), 0.0
            )
            pdf = pdf + jnp.sum(contrib, axis=-1)
        elif light.kind == KIND_ENV and light.env_tex >= 0:
            frame = ds.env_frame[light.id]
            wl = transform_direction(frame_inverse(frame), direction)
            # tx/ty only ever feed the INTEGER texel selection below, whose
            # true derivative is zero a.e. — stop the gradient here so the
            # arctan2 VJP (NaN at the zero vector: dead lanes carry
            # direction = 0) and the arccos VJP (inf at |y| = 1) cannot
            # poison the backward pass (0-cotangent x NaN-partial = NaN)
            wl = jax.lax.stop_gradient(wl)
            tx = jnp.arctan2(wl[..., 2], wl[..., 0]) / (2 * PIF)
            tx = jnp.where(tx < 0, tx + 1.0, tx)
            ty = jnp.arccos(jnp.clip(wl[..., 1], -1.0, 1.0)) / PIF
            w, h = light.env_w, light.env_h
            i = jnp.clip((tx * w).astype(jnp.int32), 0, w - 1)
            j = jnp.clip((ty * h).astype(jnp.int32), 0, h - 1)
            idx = j * w + i
            prob_tab = getattr(ds, "light_pdf_prob", None)
            if prob_tab is not None:
                # precomputed per-texel probability: one gather instead of
                # the cdf hi/lo pair
                prob = jnp.take(prob_tab, light.cdf_lo + idx, axis=0,
                                mode="clip")
            else:
                cdf = ds.light_cdf[light.cdf_lo:light.cdf_hi]
                hi = cdf[idx]
                lo = jnp.where(idx > 0, cdf[jnp.maximum(idx - 1, 0)], 0.0)
                prob = (hi - lo) / cdf[-1]
            angle = (2 * PIF / w) * (PIF / h) * jnp.sin(PIF * (j + 0.5) / h)
            pdf = pdf + prob / jnp.maximum(angle, 1e-12)
        elif light.kind == KIND_ENV:
            pdf = pdf + 1.0 / (4 * PIF)
        elif spheretrace_fn is not None:
            hit, dist, normal = spheretrace_fn(position, direction, light.id)
            area = ds.light_cdf[light.cdf_hi - 1]
            lpos = position + direction * dist[..., None]
            d2 = distance_squared(lpos, position)
            cosw = jnp.abs(dot(normal, direction))
            pdf = pdf + jnp.where(
                hit & (cosw > 1e-12), d2 / jnp.where(cosw > 1e-12, cosw * area, 1.0), 0.0
            )
    return pdf / L
