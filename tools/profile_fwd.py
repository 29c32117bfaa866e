"""Component-level timing of the volpathtrace forward step on 03_volume.

Times (per dispatch, after warmup): full shade step, BVH traversal alone on
camera rays and on incoherent (shuffled-direction) rays, traversal at several
Pallas packet sizes, light-pdf accumulation, and scene/material eval. Run on
the real TPU to locate the fwd+bwd bottlenecks (VERDICT round-2 ask #1).
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


def timeit(fn, *args, iters=8):
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
    print(f"R={R} rays, tris={r.arrays.tri_pos.shape[0]}")

    from vpt_tpu.render import state as RS
    pixel_ids = jnp.arange(R, dtype=jnp.uint32)
    o, d = jax.jit(lambda: RS.camera_rays(
        ds, 0, r.width, r.height, pixel_ids, jnp.int32(0), 64, 1301081))()
    jax.block_until_ready(o)

    # full shade step (1 sample)
    shade = r._make_shader()
    f_shade = jax.jit(lambda o, d, s: shade(ds, o, d, pixel_ids, s))
    dt = timeit(f_shade, o, d, jnp.int32(0))
    print(f"full shade step: {dt*1e3:8.2f} ms  ({R/dt/1e3:9.1f} kpaths/s)")

    # traversal alone: coherent camera rays
    from vpt_tpu.ops.bvh import intersect_scene
    f_isect = jax.jit(lambda o, d: intersect_scene(ds, o, d))
    dt = timeit(f_isect, o, d)
    print(f"traverse camera rays: {dt*1e3:8.2f} ms ({R/dt/1e6:6.2f} Mray/s)")

    # traversal: incoherent rays (shuffled directions, origins at hits)
    key = jax.random.PRNGKey(0)
    isect = f_isect(o, d)
    hitp = o + d * jnp.minimum(isect["dist"], 10.0)[:, None]
    dshuf = jax.random.normal(key, (R, 3))
    dshuf = dshuf / jnp.linalg.norm(dshuf, axis=-1, keepdims=True)
    dt = timeit(f_isect, hitp, dshuf)
    print(f"traverse incoherent : {dt*1e3:8.2f} ms ({R/dt/1e6:6.2f} Mray/s)")

    # packet-size sweep (Pallas blocks must be multiples of 8 sublanes)
    from vpt_tpu.ops import bvh_pallas as BP
    ls = int(r.arrays.bvh.leaf_rec.shape[1]) // 10
    for rows in (8, 16, 32, 64):
        f = jax.jit(lambda o, d, rows=rows: BP._traverse_pallas_impl(
            ds.bvh_packed, o, d, jnp.full((R,), 3.4e38, jnp.float32),
            1e-4, ls, block_rows=rows))
        dtc = timeit(f, o, d)
        dti = timeit(f, hitp, dshuf)
        print(f"  block_rows={rows:3d}: coherent {dtc*1e3:8.2f} ms, "
              f"incoherent {dti*1e3:8.2f} ms")

    # light pdf
    from vpt_tpu.render.lights import sample_lights_pdf, sample_lights
    f_lp = jax.jit(lambda p, d: sample_lights_pdf(ds, r.lights, p, d))
    dt = timeit(f_lp, hitp, dshuf)
    print(f"sample_lights_pdf  : {dt*1e3:8.2f} ms")
    f_ls = jax.jit(lambda p, u: sample_lights(
        ds, r.lights, p, u[:, 0], u[:, 1], u[:, :2]))
    u = jax.random.uniform(key, (R, 3))
    dt = timeit(f_ls, hitp, u)
    print(f"sample_lights      : {dt*1e3:8.2f} ms")

    # material/scene eval on hits
    from vpt_tpu.render import sceneval as SE
    from vpt_tpu.ops import bsdf as B
    def mat_eval(o, d):
        isect = intersect_scene(ds, o, d)
        mat = SE.eval_hit_material(ds, isect)
        n = SE.eval_hit_shading_normal(ds, isect, -d)
        return mat.color + n
    f_mat = jax.jit(mat_eval)
    dt_me = timeit(f_mat, o, d)
    dt_tv = timeit(f_isect, o, d)
    print(f"sceneval (eval-isect): {(dt_me-dt_tv)*1e3:8.2f} ms")


if __name__ == "__main__":
    main()
