"""Fine-grained timing of the per-bounce shading body on 03_volume.

The round-3 trace showed the forward bounce scan (212 ms of a 261 ms
fwd+bwd step) splits roughly into ~67 ms of Pallas traversal and ~145 ms of
shading body — so the body (20.7 ms/bounce) is the round-4 target. This tool
times each body component standalone at the bench shapes, plus gather
calibration microbenches, plus the per-bounce alive fraction (how much of
the scan is dead-lane waste).
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.renderer import Renderer, RenderParams
from vpt_tpu.runtime import enable_compile_cache

SCENE = "/root/reference/tests/03_volume/volume.json"


def timeit(fn, *args, iters=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def main():
    enable_compile_cache()
    params = RenderParams(shader="volpathtrace", samples=64, resolution=360,
                          bounces=8)
    r = Renderer(SCENE, params)
    ds = r.ds
    R = r.width * r.height
    T = int(r.arrays.tri_pos.shape[0])
    V = int(r.arrays.vert_attr.shape[0])
    print(f"R={R} rays, T={T} tris, V={V} verts")

    from vpt_tpu.render import state as RS
    pixel_ids = jnp.arange(R, dtype=jnp.uint32)
    o, d = jax.jit(lambda: RS.camera_rays(
        ds, 0, r.width, r.height, pixel_ids, jnp.int32(0), 64, 1301081))()
    jax.block_until_ready(o)

    # dispatch floor
    f_nop = jax.jit(lambda x: x + 1.0)
    floor = timeit(f_nop, o)
    print(f"dispatch floor: {floor*1e3:7.2f} ms")

    from vpt_tpu.ops.bvh import intersect_scene
    f_isect = jax.jit(lambda o, d: intersect_scene(ds, o, d))
    isect = f_isect(o, d)
    jax.block_until_ready(isect)

    import vpt_tpu.render.sceneval as SE
    import vpt_tpu.ops.bsdf as B
    import vpt_tpu.ops.volume as Vol
    from vpt_tpu.render.lights import sample_lights, sample_lights_pdf
    lights = r.lights
    tex_slots = frozenset(["color"])
    mat_types = frozenset(int(t) for t in np.unique(r.arrays.mat_type))
    print(f"mat_types={sorted(mat_types)} lights={[(l.kind, l.env_tex) for l in lights]}")

    rows = []

    def bench(name, fn, *args):
        dt = timeit(jax.jit(fn), *args)
        rows.append((name, dt))
        print(f"{name:34s} {dt*1e3:7.2f} ms  (-floor {max(dt-floor,0)*1e3:6.2f})")

    outgoing = -d
    bench("eval_hit_position", lambda i: SE.eval_hit_position(ds, i, o, d), isect)
    bench("eval_hit_shading_normal",
          lambda i: SE.eval_hit_shading_normal(ds, i, outgoing, tex_slots=tex_slots), isect)
    bench("eval_hit_material",
          lambda i: SE.eval_hit_material(ds, i, tex_slots=tex_slots), isect)
    bench("eval_environment", lambda dd: SE.eval_environment(ds, dd, 1), d)

    pos = jax.jit(lambda i: SE.eval_hit_position(ds, i, o, d))(isect)
    u1 = jnp.linspace(0, 1, R)
    uv2 = jnp.stack([u1, 1 - u1], axis=-1)
    bench("sample_lights",
          lambda p: sample_lights(ds, lights, p, u1, u1, uv2), pos)
    bench("sample_lights_pdf",
          lambda p, dd: sample_lights_pdf(ds, lights, p, dd), pos, d)

    mat = jax.jit(lambda i: SE.eval_hit_material(ds, i, tex_slots=tex_slots))(isect)
    nrm = jax.jit(lambda i: SE.eval_hit_shading_normal(ds, i, outgoing, tex_slots=tex_slots))(isect)
    jax.block_until_ready((mat, nrm))

    def bsdf_all(m, n):
        inc = B.sample_bsdfcos(m, n, outgoing, u1, uv2, types=mat_types)
        pdf = B.sample_bsdfcos_pdf(m, n, outgoing, inc, types=mat_types)
        ev = B.eval_bsdfcos(m, n, outgoing, inc, types=mat_types)
        incd = B.sample_delta(m, n, outgoing, u1, types=mat_types)
        pdfd = B.sample_delta_pdf(m, n, outgoing, incd, types=mat_types)
        evd = B.eval_delta(m, n, outgoing, incd, types=mat_types)
        return inc, pdf, ev, incd, pdfd, evd
    bench("bsdf sample+pdf+eval (nd+delta)", bsdf_all, mat, nrm)

    dens = jnp.abs(pos) * 0.5 + 0.1
    def vol_all(dn):
        td = Vol.sample_transmittance(dn, jnp.full((R,), 3.0), u1, 1 - u1)
        w = Vol.eval_transmittance(dn, td)
        p = Vol.sample_transmittance_pdf(dn, td, jnp.full((R,), 3.0))
        inc = Vol.sample_phasefunction(u1 * 0.5, outgoing, uv2)
        pp = Vol.sample_phasefunction_pdf(u1 * 0.5, outgoing, inc)
        ev = Vol.eval_scattering(dn, dn, u1 * 0.5, outgoing, inc)
        return td, w, p, inc, pp, ev
    bench("volume machinery", vol_all, dens)

    # RNG: one bounce's worth of pair draws (6 pairs)
    from vpt_tpu.core import rng as RNG
    def rng_bank(pid):
        outs = []
        for k in range(6):
            outs.append(RNG.uniform_float_pair(pid, 3, 4 + 2 * k, 1301081))
        return outs
    bench("rng bank (6 threefry pairs)", rng_bank, pixel_ids)

    # gather calibration
    gidx = ((pixel_ids * jnp.uint32(2654435761)) % T).astype(jnp.int32)
    vidx = ((pixel_ids * jnp.uint32(2654435761)) % V).astype(jnp.int32)
    bench("gather (T,4) meta", lambda g: ds.tri_meta[g], gidx)
    bench("gather (V,9) x3 corners",
          lambda g: ds.vert_attr[jnp.stack([g, (g+1) % V, (g+2) % V], -1)], vidx)
    P = int(ds.tex_pixels.shape[0])
    pidx = ((pixel_ids * jnp.uint32(2654435761)) % P).astype(jnp.int32)
    bench("gather tex_pixels x4 taps",
          lambda g: (ds.tex_pixels[g], ds.tex_pixels[(g + 1) % P],
                     ds.tex_pixels[(g + 7) % P], ds.tex_pixels[(g + 8) % P]),
          pidx)
    bench("gather tex_pixels x1 tap", lambda g: ds.tex_pixels[g], pidx)

    # marginal cost per added bounce: full shade at bounces=1..8; the delta
    # between consecutive rows is the real in-step cost of that bounce
    # (traversal with its dead-block exits + body with its masked lanes)
    from vpt_tpu.render.integrator import make_path_shader
    print("\nfull shade step vs bounce count (marginal = in-step bounce cost):")
    prev = None
    for b in (1, 2, 3, 4, 6, 8):
        shade_b = make_path_shader(
            lights, 1, bounces=b, enable_volume=True, mis=True, seed=1301081,
            mat_types=mat_types, tex_slots=tex_slots, opacity_extra=0,
            can_opacity=False)
        f = jax.jit(lambda o, d, s, sh=shade_b: sh(ds, o, d, pixel_ids, s))
        dt = timeit(f, o, d, jnp.int32(0), iters=8)
        marg = "" if prev is None else f"  marginal {(dt-prev)*1e3:7.2f} ms"
        print(f"  bounces={b}: {dt*1e3:8.2f} ms{marg}")
        prev = dt


if __name__ == "__main__":
    main()
