"""Wavefront integrators: volpathtrace / pathtrace / naive / eyelight / AOVs.

Architecture (SURVEY.md §7, BASELINE north star): instead of the reference's
recursive per-ray megakernel (shade_volpathtrace,
/root/reference/libs/yocto_pathtrace/yocto_pathtrace.cpp:565-687), all rays
advance one bounce per step of a fixed-depth `lax.scan` carrying a
struct-of-arrays bounce state. Per-bounce work (BVH intersect, material eval,
BSDF/light sampling, MIS weights) is fully vectorized and branchless; dead
rays are masked. The volume "stack" is a single slot + depth counter — this
is EXACT parity, not an approximation: the reference's vstack is a
std::vector but its update rule is `if (vstack.empty()) push_back(...) else
pop_back()` (cpp:642-648), so entering a second volume while inside one POPS
the first and the stack never exceeds depth 1. A nested-media scene rendered
by the compiled reference binary confirms this (tests/test_golden.py
nested-media row).

Opacity passthrough parity (cpp:607-611): the reference rewinds its bounce
counter on passthrough (`bounce -= 1`), so semi-transparent crossings are
free. In the wavefront scan each ray carries `nbounce` (real interactions
taken); passthrough skips the increment, rays stop at nbounce == bounces,
and the scan runs `bounces + extra` iterations to fund the free crossings.
The machinery is enabled statically only when the scene can produce
opacity < 1 (renderer checks materials, vertex colors, and bound color
textures); fully opaque scenes compile the plain fixed-depth scan.

Deviation from the reference, by design: RNG is counter-based per
(pixel, sample, bounce, slot) instead of a mutable PCG stream —
deterministic under any sharding.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core import rng
from ..core.vecmath import FLT_MAX, dot, vmax
from ..ops import bsdf as B
from ..ops import volume as V
from ..ops.bvh import intersect_scene
from . import sceneval as SE
from .lights import sample_lights, sample_lights_pdf

DRAWS_PER_BOUNCE = 16
CAMERA_DRAWS = 4

# debugging aid: unroll the bounce loop so jax_debug_nans points at the op
UNROLL_BOUNCES_DEBUG = False


class PathState(NamedTuple):
    ray_o: jnp.ndarray      # (R, 3)
    ray_d: jnp.ndarray      # (R, 3)
    radiance: jnp.ndarray   # (R, 3)
    weight: jnp.ndarray     # (R, 3)
    alive: jnp.ndarray      # (R,) bool
    hit0: jnp.ndarray       # (R,) bool: first-bounce surface hit (alpha)
    nbounce: jnp.ndarray    # (R,) int32: real bounces taken (passthrough free)
    vol_depth: jnp.ndarray  # (R,) int32
    vol_density: jnp.ndarray     # (R, 3)
    vol_scattering: jnp.ndarray  # (R, 3)
    vol_scaniso: jnp.ndarray     # (R,)
    vol_emission: jnp.ndarray    # (R, 3)


def _u(pixel_id, sample_id, bounce, k, seed):
    slot = CAMERA_DRAWS + bounce * DRAWS_PER_BOUNCE + k
    return rng.uniform_float(pixel_id, sample_id, slot, seed)


def _u2(pixel_id, sample_id, bounce, k, seed):
    return jnp.stack(
        [_u(pixel_id, sample_id, bounce, k, seed),
         _u(pixel_id, sample_id, bounce, k + 1, seed)], axis=-1)


def _make_ubank(pixel_id, sample_id, bounce, seed):
    """Per-bounce draw bank: draws come in threefry PAIRS (one cipher call
    yields two uniforms), memoized at trace time, so a 12-draw bounce costs
    6 cipher evaluations instead of 12. Draw k lives in pair k//2 at even
    slot CAMERA_DRAWS + bounce*DRAWS_PER_BOUNCE + 2*(k//2)."""
    cache = {}

    def u(k):
        p = k // 2
        if p not in cache:
            slot = CAMERA_DRAWS + bounce * DRAWS_PER_BOUNCE + 2 * p
            cache[p] = rng.uniform_float_pair(pixel_id, sample_id, slot, seed)
        return cache[p][k % 2]

    def u2(k):
        return jnp.stack([u(k), u(k + 1)], axis=-1)

    return u, u2


def make_bounce_body(lights, n_envs: int, *, bounces: int,
                     enable_volume: bool, mis: bool, naive: bool, seed: int,
                     mat_types, tex_slots, opacity_extra: int,
                     can_opacity: bool, env_meta=None,
                     track_nbounce: bool | None = None):
    """One path-tracing bounce as a reusable body:
    body(ds, st, bounce, pixel_id, sample_id, first=False) -> PathState.

    `bounce` may be a scalar (fixed-depth scan — all lanes at the same
    bounce) or a per-lane i32 array (pool renderer — every lane at its own
    bounce); it addresses the RNG draw bank. Semantics per
    shade_volpathtrace/shade_pathtrace/shade_naive
    (yocto_pathtrace.cpp:565-832); see make_path_shader for parity notes.

    track_nbounce: maintain the per-lane real-bounce counter and use it for
    termination/RR (forced on when opacity_extra > 0; the pool renderer
    always needs it)."""
    mat_types = frozenset(mat_types)
    tex_slots = frozenset(tex_slots)
    if track_nbounce is None:
        track_nbounce = opacity_extra > 0

    def _bounce_live(ds, st: PathState, bounce, pixel_id, sample_id,
                     first: bool = False):
        # first=True: the peeled camera bounce — every ray is alive and
        # outside any volume, so the transmittance/scatter machinery is
        # statically dead code
        vol_here = enable_volume and not first
        u, u2 = _make_ubank(pixel_id, sample_id, bounce, seed)

        if track_nbounce:
            # rays whose real-bounce budget is spent stop cold (the
            # reference loop exits before tracing another ray)
            st = st._replace(alive=st.alive & (st.nbounce < bounces))
        isect = intersect_scene(ds, st.ray_o, st.ray_d, alive=st.alive,
                                sort_rays=not first)
        hit = isect["hit"]
        # environment on miss
        env = SE.eval_environment(ds, st.ray_d, n_envs, env_meta)
        radiance = jnp.where(
            (st.alive & ~hit)[..., None], st.radiance + st.weight * env,
            st.radiance)
        alive = st.alive & hit

        # --- transmittance sampling inside a volume (cpp:586-596) ---
        dist_surf = isect["dist"]
        in_vol = alive & (st.vol_depth > 0) if vol_here else (
            jnp.zeros_like(alive))
        if vol_here:
            # sanitize inputs for rays not in a volume: FLT_MAX distances
            # in the unselected where-branch poison reverse-mode AD
            # (0 * inf = NaN cotangents)
            safe_surf = jnp.where(
                in_vol, jnp.minimum(dist_surf, 1e30), 1.0)
            t_dist = V.sample_transmittance(st.vol_density, safe_surf, u(0), u(1))
            t_dist = jnp.where(in_vol, jnp.minimum(t_dist, 1e30), 0.5)
            # denominator 1.0 for masked lanes and a 1e-12 floor for live
            # ones: a 1e-30 floor made the division's own VJP compute
            # -T/m^2 = 1e60 -> f32 inf, and inf x masked-0-cotangent = NaN
            # poisoning every material gradient
            tr_pdf = V.sample_transmittance_pdf(
                st.vol_density, t_dist, safe_surf)
            tr_den = jnp.where(in_vol, jnp.maximum(tr_pdf, 1e-12), 1.0)
            w_tr = V.eval_transmittance(
                st.vol_density, t_dist) / tr_den[..., None]
            weight = jnp.where(in_vol[..., None], st.weight * w_tr, st.weight)
            in_scatter = in_vol & (t_dist < dist_surf)
        else:
            weight = st.weight
            in_scatter = jnp.zeros_like(alive)
            t_dist = dist_surf

        # ======== surface branch (cpp:599-652) ========
        surf = alive & ~in_scatter
        outgoing = -st.ray_d
        position = SE.eval_hit_position(ds, isect, st.ray_o, st.ray_d)
        normal = SE.eval_hit_shading_normal(ds, isect, outgoing,
                                            tex_slots=tex_slots)
        mat = SE.eval_hit_material(ds, isect, tex_slots=tex_slots)

        # exactly one of {surface shade, volume scatter} applies per ray,
        # so the light-sampling machinery (env-CDF sample + pdf walk over
        # all lights, the two most gather-heavy ops in the step) runs
        # ONCE on merged positions/directions instead of per branch
        if vol_here:
            vpos = st.ray_o + st.ray_d * t_dist[..., None]
            light_pos = jnp.where(in_scatter[..., None], vpos, position)
        else:
            light_pos = position
        if mis and not naive:
            inc_light = sample_lights(ds, lights, light_pos, u(7), u(8),
                                      u2(9), racc=u(12))

        if can_opacity:
            passthrough = surf & (mat.opacity < 1.0) & (u(2) >= mat.opacity)
            shade_surf = surf & ~passthrough
        else:  # statically opaque scene: no passthrough draw/masking
            passthrough = jnp.zeros_like(surf)
            shade_surf = surf

        # alpha parity: the reference rewinds its bounce counter on
        # opacity passthrough (cpp:607-611), so a camera ray that passes
        # through a semi-transparent surface and shades a real surface
        # later still counts as a first-bounce hit. With the rewind
        # machinery armed, gate on the real-bounce counter.
        first_real = (st.nbounce == 0) if track_nbounce else (bounce == 0)
        hit0 = st.hit0 | (shade_surf & first_real)
        radiance = jnp.where(
            shade_surf[..., None],
            radiance + weight * B.eval_emission(mat, normal, outgoing),
            radiance)

        delta = B.is_delta(mat)
        # non-delta: 0.5 bsdf / 0.5 light one-sample MIS
        inc_bsdf = B.sample_bsdfcos(mat, normal, outgoing, u(4), u2(5), types=mat_types)
        if mis and not naive:
            use_bsdf = u(3) < 0.5
            incoming_nd = jnp.where(use_bsdf[..., None], inc_bsdf, inc_light)
        else:
            incoming_nd = inc_bsdf
        pdf_b = B.sample_bsdfcos_pdf(mat, normal, outgoing, incoming_nd, types=mat_types)

        # volume scatter direction (needed now so the merged light pdf
        # can cover both branches in one walk)
        if vol_here:
            inc_phase = V.sample_phasefunction(st.vol_scaniso, outgoing, u2(5))
            incoming_v = jnp.where(
                (u(3) < 0.5)[..., None], inc_phase, inc_light)
            light_dir = jnp.where(
                in_scatter[..., None], incoming_v, incoming_nd)
        else:
            light_dir = incoming_nd

        if mis and not naive:
            pdf_l = sample_lights_pdf(ds, lights, light_pos, light_dir)
            denom = 0.5 * pdf_b + 0.5 * pdf_l
            f_val = B.eval_bsdfcos(mat, normal, outgoing, incoming_nd, types=mat_types)
            w_nd = jnp.where(
                (denom > 0)[..., None],
                f_val / jnp.where(denom > 0, denom, 1.0)[..., None], 0.0)
        else:
            f_val = B.eval_bsdfcos(mat, normal, outgoing, incoming_nd, types=mat_types)
            w_nd = jnp.where(
                (pdf_b > 0)[..., None],
                f_val / jnp.where(pdf_b > 0, pdf_b, 1.0)[..., None], 0.0)
        # delta lobes
        inc_delta = B.sample_delta(mat, normal, outgoing, u(4), types=mat_types)
        pdf_d = B.sample_delta_pdf(mat, normal, outgoing, inc_delta, types=mat_types)
        f_d = B.eval_delta(mat, normal, outgoing, inc_delta, types=mat_types)
        w_d = jnp.where(
            (pdf_d > 0)[..., None],
            f_d / jnp.where(pdf_d > 0, pdf_d, 1.0)[..., None], 0.0)

        incoming = jnp.where(delta[..., None], inc_delta, incoming_nd)
        w_scale = jnp.where(delta[..., None], w_d, w_nd)
        inc_zero = jnp.all(incoming == 0.0, axis=-1)
        alive = alive & jnp.where(shade_surf, ~inc_zero, True)
        weight = jnp.where(shade_surf[..., None], weight * w_scale, weight)

        # volume stack update (cpp:642-648)
        if enable_volume:
            crossing = B.is_volumetric(mat) & (
                dot(normal, outgoing) * dot(normal, incoming) < 0.0)
            do_push = shade_surf & crossing & (st.vol_depth == 0)
            do_pop = shade_surf & crossing & (st.vol_depth > 0)
            vol_depth = jnp.where(
                do_push, 1, jnp.where(do_pop, st.vol_depth - 1, st.vol_depth))
            vol_density = jnp.where(do_push[..., None], mat.density, st.vol_density)
            vol_scattering = jnp.where(
                do_push[..., None], mat.scattering, st.vol_scattering)
            vol_scaniso = jnp.where(do_push, mat.scanisotropy, st.vol_scaniso)
            vol_emission = jnp.where(do_push[..., None], mat.emission, st.vol_emission)
        else:
            vol_depth = st.vol_depth
            vol_density, vol_scattering = st.vol_density, st.vol_scattering
            vol_scaniso, vol_emission = st.vol_scaniso, st.vol_emission

        if can_opacity:
            new_o = jnp.where(
                passthrough[..., None], position + st.ray_d * 1e-2,
                jnp.where(shade_surf[..., None], position, st.ray_o))
        else:
            new_o = jnp.where(shade_surf[..., None], position, st.ray_o)
        new_d = jnp.where(shade_surf[..., None], incoming, st.ray_d)

        # ======== volume scattering branch (cpp:654-673) ========
        if vol_here:
            # eval_emission(vol, position, outgoing) quirk: "normal" is the
            # position (cpp:660) — mirror exactly
            vol_emit = jnp.where(
                (dot(vpos, outgoing) >= 0.0)[..., None], st.vol_emission, 0.0)
            radiance = jnp.where(
                in_scatter[..., None], radiance + weight * vol_emit, radiance)
            pdf_ph = V.sample_phasefunction_pdf(st.vol_scaniso, outgoing, incoming_v)
            # pdf_l was evaluated at (light_pos, light_dir) which equals
            # (vpos, incoming_v) exactly for in_scatter rays
            denom_v = 0.5 * pdf_ph + 0.5 * pdf_l
            f_scat = V.eval_scattering(
                st.vol_density, st.vol_scattering, st.vol_scaniso,
                outgoing, incoming_v)
            w_v = jnp.where(
                (denom_v > 0)[..., None],
                f_scat / jnp.where(denom_v > 0, denom_v, 1.0)[..., None], 0.0)
            weight = jnp.where(in_scatter[..., None], weight * w_v, weight)
            new_o = jnp.where(in_scatter[..., None], vpos, new_o)
            new_d = jnp.where(in_scatter[..., None], incoming_v, new_d)

        # weight check + russian roulette (cpp:676-683)
        active_shaded = alive & (shade_surf | in_scatter)
        wzero = jnp.all(weight == 0.0, axis=-1) | ~jnp.all(
            jnp.isfinite(weight), axis=-1)
        alive = alive & jnp.where(active_shaded, ~wzero, True)
        if bounces > 4:
            rr_prob = jnp.minimum(0.99, vmax(weight))
            bounce_eff = st.nbounce if track_nbounce else bounce
            do_rr = active_shaded & (bounce_eff > 3)
            rr_kill = do_rr & (u(11) >= rr_prob)
            alive = alive & ~rr_kill
            weight = jnp.where(
                (do_rr & ~rr_kill)[..., None],
                weight / jnp.maximum(rr_prob, 1e-12)[..., None], weight)

        if track_nbounce:
            nbounce = st.nbounce + jnp.where(
                st.alive & ~passthrough, 1, 0).astype(jnp.int32)
        else:
            nbounce = st.nbounce
        return PathState(
            ray_o=new_o, ray_d=new_d, radiance=radiance, weight=weight,
            alive=alive, hit0=hit0, nbounce=nbounce, vol_depth=vol_depth,
            vol_density=vol_density, vol_scattering=vol_scattering,
            vol_scaniso=vol_scaniso, vol_emission=vol_emission,
        )

    return _bounce_live


def init_path_state(ray_o, ray_d) -> PathState:
    R = ray_o.shape[0]
    f3 = lambda v=0.0: jnp.full((R, 3), v, jnp.float32)
    return PathState(
        ray_o=ray_o, ray_d=ray_d,
        radiance=f3(0.0), weight=f3(1.0),
        alive=jnp.ones((R,), bool), hit0=jnp.zeros((R,), bool),
        nbounce=jnp.zeros((R,), jnp.int32),
        vol_depth=jnp.zeros((R,), jnp.int32),
        vol_density=f3(), vol_scattering=f3(),
        vol_scaniso=jnp.zeros((R,), jnp.float32), vol_emission=f3(),
    )


def make_path_shader(lights, n_envs: int, *, bounces: int = 4,
                     enable_volume: bool = True, mis: bool = True,
                     naive: bool = False, seed: int = 1301081,
                     mat_types=B.ALL_TYPES, tex_slots=SE.ALL_TEX_SLOTS,
                     opacity_extra: int = 0, can_opacity: bool = True,
                     env_meta=None):
    """Returns shade(ds, ray_o, ray_d, pixel_id, sample_id) ->
    (radiance, alpha) — the fixed-depth wavefront scan over
    make_bounce_body.

    enable_volume=True, mis=True  -> shade_volpathtrace (cpp:565-687)
    enable_volume=False, mis=True -> shade_pathtrace    (cpp:690-762)
    naive=True                    -> shade_naive        (cpp:765-832)

    mat_types: static set of material-type codes present in the scene —
    BSDF dispatch skips absent lobes at trace time.
    opacity_extra: extra scan iterations funding opacity-passthrough
    crossings (reference bounce-rewind parity, cpp:607-611). 0 disables the
    per-ray bounce counters entirely (fully opaque scenes).
    can_opacity: False skips the passthrough draw + masking entirely
    (statically opaque scene).
    tex_slots: static set of texture-slot names any material actually binds
    ("emission"/"color"/"roughness"/"scattering"/"normal") — unbound slots
    skip their gathers into the texture atlas entirely.
    """
    # the volume-scatter branch needs the merged light sample/pdf machinery;
    # without MIS it would reference draws that are never made (the
    # reference has no naive/non-MIS volumetric shader either)
    assert not (enable_volume and (naive or not mis)), (
        "enable_volume requires mis=True, naive=False")
    body = make_bounce_body(
        lights, n_envs, bounces=bounces, enable_volume=enable_volume,
        mis=mis, naive=naive, seed=seed, mat_types=mat_types,
        tex_slots=tex_slots, opacity_extra=opacity_extra,
        can_opacity=can_opacity, env_meta=env_meta)

    def shade(ds, ray_o, ray_d, pixel_id, sample_id):
        state = init_path_state(ray_o, ray_d)

        # The any-alive skip is a real lax.cond: once every ray in the shard
        # is dead the remaining scan iterations cost ~nothing, which is what
        # makes the reference's --bounces 64 configs affordable (RR kills
        # most paths within ~8 bounces). BUT the cond itself is expensive —
        # XLA copies the carried PathState through the conditional (measured
        # 10.9 ms per bounce on a v5e, PERF.md §2). Only use it when enough
        # trailing iterations can be skipped to win back the copies.
        use_alive_cond = (bounces + opacity_extra) > 16

        def bounce_step(st: PathState, bounce):
            if not use_alive_cond:
                return body(ds, st, bounce, pixel_id, sample_id), None
            return jax.lax.cond(
                jnp.any(st.alive),
                lambda s: body(ds, s, bounce, pixel_id, sample_id),
                lambda s: s, st), None

        # scan over bounces (a while-loop here blows up XLA compile time
        # ~20x through the remote-compile tunnel); dead rays cost ~nothing
        # in later bounces because traversal starts with cursor -1 for them
        # and the inner while exits immediately once all are dead
        n_iters = bounces + opacity_extra
        if UNROLL_BOUNCES_DEBUG:
            for b in range(n_iters):
                state, _ = bounce_step(state, jnp.int32(b))
        else:
            # peel the camera bounce: all rays alive, none inside a volume —
            # the transmittance/scatter machinery compiles away
            state = body(ds, state, jnp.int32(0), pixel_id, sample_id,
                         first=True)
            if n_iters > 1:
                state, _ = jax.lax.scan(
                    bounce_step, state, jnp.arange(1, n_iters))
        radiance = state.radiance
        finite = jnp.all(jnp.isfinite(radiance), axis=-1)
        radiance = jnp.where(finite[..., None], radiance, 0.0)
        return radiance, state.hit0.astype(jnp.float32)

    return shade


def make_eyelight_shader(lights, n_envs: int, *, bounces: int = 4,
                         seed: int = 1301081, env_meta=None):
    """shade_eyelight (cpp:835-890): pif * bsdfcos(out, out), follows delta
    chains up to max(bounces, 4)."""

    def shade(ds, ray_o, ray_d, pixel_id, sample_id):
        R = ray_o.shape[0]

        def bounce_step(c, bounce):
            # lax.scan, not a Python unroll: with --bounces 64 an unrolled
            # loop emits 64 copies of intersect+shade into one XLA program
            # (multi-minute compile for a preview shader — VERDICT r2 #7)
            o, d, radiance, weight, alive, hit0 = c
            isect = intersect_scene(ds, o, d, alive=alive)
            hit = isect["hit"]
            env = SE.eval_environment(ds, d, n_envs, env_meta)
            radiance = jnp.where(
                (alive & ~hit)[..., None], radiance + weight * env, radiance)
            alive = alive & hit
            outgoing = -d
            position = SE.eval_hit_position(ds, isect, o, d)
            normal = SE.eval_hit_shading_normal(ds, isect, outgoing)
            mat = SE.eval_hit_material(ds, isect)
            hit0 = hit0 | (alive & (bounce == 0))
            radiance = jnp.where(
                alive[..., None],
                radiance + weight * B.eval_emission(mat, normal, outgoing)
                + weight * jnp.pi * B.eval_bsdfcos(mat, normal, outgoing, outgoing),
                radiance)
            delta = B.is_delta(mat)
            rnl = _u(pixel_id, sample_id, bounce, 4, seed)
            inc = B.sample_delta(mat, normal, outgoing, rnl)
            pdf = B.sample_delta_pdf(mat, normal, outgoing, inc)
            f_d = B.eval_delta(mat, normal, outgoing, inc)
            w_d = jnp.where((pdf > 0)[..., None],
                            f_d / jnp.where(pdf > 0, pdf, 1.0)[..., None], 0.0)
            cont = alive & delta & jnp.any(inc != 0.0, axis=-1)
            weight = jnp.where(cont[..., None], weight * w_d, weight)
            alive = cont & jnp.any(weight != 0.0, axis=-1)
            o = jnp.where(cont[..., None], position, o)
            d = jnp.where(cont[..., None], inc, d)
            return (o, d, radiance, weight, alive, hit0), None

        init = (ray_o, ray_d, jnp.zeros((R, 3)), jnp.ones((R, 3)),
                jnp.ones((R,), bool), jnp.zeros((R,), bool))
        (o, d, radiance, weight, alive, hit0), _ = jax.lax.scan(
            bounce_step, init, jnp.arange(max(bounces, 4)))
        finite = jnp.all(jnp.isfinite(radiance), axis=-1)
        return jnp.where(finite[..., None], radiance, 0.0), hit0.astype(jnp.float32)

    return shade


def make_debug_shader(n_envs: int, which: str):
    """First-hit AOVs: normal / texcoord / color (cpp:893-930)."""

    def shade(ds, ray_o, ray_d, pixel_id, sample_id):
        isect = intersect_scene(ds, ray_o, ray_d)
        hit = isect["hit"]
        outgoing = -ray_d
        if which == "normal":
            val = SE.eval_hit_shading_normal(ds, isect, outgoing)
        elif which == "texcoord":
            tc = SE.eval_hit_texcoord(ds, isect)
            val = jnp.concatenate([tc, jnp.zeros_like(tc[..., :1])], axis=-1)
        elif which == "color":
            val = SE.eval_hit_material(ds, isect).color
        else:
            raise ValueError(which)
        val = jnp.where(hit[..., None], val, 0.0)
        return val, hit.astype(jnp.float32)

    return shade
