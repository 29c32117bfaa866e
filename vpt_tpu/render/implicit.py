"""Implicit-surface (SDF) integrators: shade_implicit / shade_implicit_normal.

Mirrors yocto_pathtrace.cpp:425-562 as a wavefront scan: per bounce sphere
trace the whole SDF scene, FD normal, untextured material eval, optional MIS
against SDF/area/env lights (noimplicit_mis selects pure-BSDF weighting), the
same opacity/RR rules as the surface integrator.

Deviation (documented): the reference evaluates the SDF-light pdf normal at
the shading point instead of the light hit point
(yocto_pathtrace.cpp:388-390, passes `position`); we use the hit point, which
is the mathematically intended quantity. The affected scenes (06/07) have no
checked-in goldens.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import dot, vmax
from ..ops import bsdf as B
from ..ops.sdf import attach_cell_rows, eval_sdf_normal, reattach_t, spheretrace
from . import sceneval as SE
from .integrator import _u, _u2
from .lights import sample_lights, sample_lights_pdf


def eval_material_untextured(ds, mat_id) -> B.MaterialPoint:
    """eval_material(scene, material_handle) (yocto_scene.cpp:581-619)."""
    mtype = ds.mat_type[mat_id]
    color = ds.mat_color[mat_id]
    roughness = ds.mat_roughness[mat_id] ** 2
    trdepth = ds.mat_trdepth[mat_id]
    volumetric_like = (
        (mtype == B.REFRACTIVE) | (mtype == B.VOLUMETRIC) | (mtype == B.SUBSURFACE))
    # double-where (see sceneval.py): trdepth is 0 for non-volumetric
    # materials, and log(1)/0 = NaN in the unselected branch poisons
    # reverse-mode gradients of mat_color
    safe_tr = jnp.where(volumetric_like, trdepth, 1.0)[..., None]
    density = jnp.where(
        volumetric_like[..., None],
        -jnp.log(jnp.clip(color, 1e-4, 1.0)) / safe_tr, 0.0)
    clamped = (mtype == B.MATTE) | (mtype == B.GLTFPBR) | (mtype == B.GLOSSY)
    roughness = jnp.where(
        clamped, jnp.clip(roughness, B.MIN_ROUGHNESS, 1.0),
        jnp.where(mtype == B.VOLUMETRIC, 0.0,
                  jnp.where(roughness < B.MIN_ROUGHNESS, 0.0, roughness)))
    return B.MaterialPoint(
        mtype=mtype, emission=ds.mat_emission[mat_id], color=color,
        opacity=ds.mat_opacity[mat_id], roughness=roughness,
        metallic=ds.mat_metallic[mat_id], ior=ds.mat_ior[mat_id],
        density=density, scattering=ds.mat_scattering[mat_id],
        scanisotropy=ds.mat_scanisotropy[mat_id], trdepth=trdepth)


def make_implicit_shader(lights, n_envs: int, *, params, normal_only=False):
    bounces = params.bounces
    maxiter = params.spheretrace_maxiter
    no_mis = params.noimplicit_mis
    seed = params.seed

    def shade_normal(ds, ray_o, ray_d, pixel_id, sample_id):
        ds = attach_cell_rows(ds)  # hoist the corner-row table (PERF.md r5)
        hit, t, kind, idx = spheretrace(ds, ray_o, ray_d, maxiter)
        pos = ray_o + ray_d * t[..., None]
        n = eval_sdf_normal(ds, pos, t)
        val = jnp.where(hit[..., None], n * 0.5 + 0.5, 0.0)
        return val, hit.astype(jnp.float32)

    if normal_only:
        return shade_normal

    def shade(ds, ray_o, ray_d, pixel_id, sample_id):
        R = ray_o.shape[0]
        ds = attach_cell_rows(ds)  # hoist the corner-row table (PERF.md r5)

        def sdf_light_fn(position, direction, sdf_id):
            hit, t, _, _ = spheretrace(
                ds, position, direction, maxiter, sdf_id=sdf_id)
            lpos = position + direction * t[..., None]
            n = eval_sdf_normal(ds, lpos, t)
            return hit, t, n

        def bounce_step(st, bounce):
            u = lambda k: _u(pixel_id, sample_id, bounce, k, seed)
            u2 = lambda k: _u2(pixel_id, sample_id, bounce, k, seed)
            o, d, radiance, weight, alive, hit0 = st

            hit, t_det, kind, idx = spheretrace(ds, o, d, maxiter, alive=alive)
            t = reattach_t(ds, o, d, t_det, hit)
            env = SE.eval_environment(ds, d, n_envs)
            radiance = jnp.where(
                (alive & ~hit)[..., None], radiance + weight * env, radiance)
            alive = alive & hit

            outgoing = -d
            position = o + d * t[..., None]
            normal = eval_sdf_normal(ds, position, t_det)

            # material handle: grid instance material or analytic sdf material
            vi_mat = ds.vi_material[jnp.maximum(idx, 0)] if (
                ds.vi_material.shape[0] > 0) else jnp.zeros_like(idx)
            sd_mat = ds.sdf_material[jnp.maximum(idx, 0)] if (
                ds.sdf_material.shape[0] > 0) else jnp.zeros_like(idx)
            mat_id = jnp.where(kind == 0, vi_mat, sd_mat)
            mat = eval_material_untextured(ds, jnp.maximum(mat_id, 0))

            passthrough = alive & (mat.opacity < 1.0) & (u(2) >= mat.opacity)
            shade_s = alive & ~passthrough
            hit0 = hit0 | (shade_s & (bounce == 0))
            radiance = jnp.where(
                shade_s[..., None],
                radiance + weight * B.eval_emission(mat, normal, outgoing),
                radiance)

            delta = B.is_delta(mat)
            bsdf_prob = 1.0 if no_mis else 0.5
            inc_bsdf = B.sample_bsdfcos(mat, normal, outgoing, u(4), u2(5))
            inc_light = sample_lights(ds, lights, position, u(7), u(8), u2(9),
                                      racc=u(12))
            use_bsdf = u(3) < bsdf_prob
            incoming_nd = jnp.where(use_bsdf[..., None], inc_bsdf, inc_light)
            f_val = B.eval_bsdfcos(mat, normal, outgoing, incoming_nd)
            pdf_b = B.sample_bsdfcos_pdf(mat, normal, outgoing, incoming_nd)
            if no_mis:
                denom = pdf_b
            else:
                pdf_l = sample_lights_pdf(
                    ds, lights, position, incoming_nd,
                    spheretrace_fn=sdf_light_fn)
                denom = 0.5 * pdf_b + 0.5 * pdf_l
            w_nd = jnp.where(
                (denom > 0)[..., None],
                f_val / jnp.where(denom > 0, denom, 1.0)[..., None], 0.0)

            inc_delta = B.sample_delta(mat, normal, outgoing, u(4))
            pdf_d = B.sample_delta_pdf(mat, normal, outgoing, inc_delta)
            f_d = B.eval_delta(mat, normal, outgoing, inc_delta)
            w_d = jnp.where(
                (pdf_d > 0)[..., None],
                f_d / jnp.where(pdf_d > 0, pdf_d, 1.0)[..., None], 0.0)

            incoming = jnp.where(delta[..., None], inc_delta, incoming_nd)
            w_scale = jnp.where(delta[..., None], w_d, w_nd)
            inc_zero = jnp.all(incoming == 0.0, axis=-1)
            alive = alive & jnp.where(shade_s, ~inc_zero, True)
            weight = jnp.where(shade_s[..., None], weight * w_scale, weight)

            new_o = jnp.where(
                passthrough[..., None], position + d * 1e-2,
                jnp.where(shade_s[..., None], position, o))
            new_d = jnp.where(shade_s[..., None], incoming, d)

            wzero = jnp.all(weight == 0.0, axis=-1) | ~jnp.all(
                jnp.isfinite(weight), axis=-1)
            alive = alive & jnp.where(shade_s, ~wzero, True)
            rr_prob = jnp.minimum(0.99, vmax(weight))
            do_rr = alive & shade_s & (bounce > 3)
            rr_kill = do_rr & (u(11) >= rr_prob)
            alive = alive & ~rr_kill
            weight = jnp.where(
                (do_rr & ~rr_kill)[..., None],
                weight / jnp.maximum(rr_prob, 1e-12)[..., None], weight)
            return (new_o, new_d, radiance, weight, alive, hit0), None

        init = (
            ray_o, ray_d, jnp.zeros((R, 3)), jnp.ones((R, 3)),
            jnp.ones((R,), bool), jnp.zeros((R,), bool))
        st, _ = jax.lax.scan(bounce_step, init, jnp.arange(bounces))
        _, _, radiance, _, _, hit0 = st
        finite = jnp.all(jnp.isfinite(radiance), axis=-1)
        radiance = jnp.where(finite[..., None], radiance, 0.0)
        # shade_implicit returns alpha 1 unconditionally (cpp:534)
        return radiance, jnp.ones((R,), jnp.float32)

    return shade
