"""Round-5 profiling: where does the implicit shader's time go?

Breaks the 06_gridsdf bench config (360 px, maxiter 450, bounces 4) into:
  - camera-ray sphere trace alone (the queued work-queue tracer), at
    several queue widths;
  - the per-bounce full-R fixed evals (reattach_t, eval_sdf_normal,
    sample_lights_pdf's analytic light trace);
  - mean march step counts (host replay of the march on a subsample).
"""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=3):
    out = fn(*args)
    jax.tree.map(lambda a: a.block_until_ready(), out)
    # force completion with a value fetch (tunnel pathology, PERF.md)
    first = jax.tree.leaves(out)[0]
    float(np.asarray(first).reshape(-1)[0])
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    first = jax.tree.leaves(out)[0]
    float(np.asarray(first).reshape(-1)[0])
    return (time.time() - t0) / iters


def main():
    from vpt_tpu.renderer import Renderer, RenderParams
    from vpt_tpu.render import state as RS
    from vpt_tpu.ops import sdf as S
    from vpt_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    p = RenderParams(shader="implicit", samples=16, resolution=360,
                     bounces=4, spheretrace_maxiter=450)
    r = Renderer("/root/reference/tests/06_gridsdf/gridsdf.json", p)
    ds = r.ds
    W, H = r.width, r.height
    R = W * H
    print(f"image {W}x{H} R={R}")
    print("grids:", ds.grid_values.shape, "vi:", ds.vi_frame.shape[0],
          "analytic:", ds.sdf_frame.shape[0])

    pix = jnp.arange(R, dtype=jnp.uint32)
    o, d = jax.jit(lambda ds: RS.camera_rays(
        ds, 0, W, H, pix, jnp.int32(0), 2, 1301081))(ds)

    # 1) the queued camera trace at several widths
    for lanes in (8192, 16384, 32768, 65536):
        S._QUEUE_LANES = lanes
        S._QUEUE_MIN_RAYS = 4 * 8192
        f = jax.jit(lambda ds, o, d: S.spheretrace(ds, o, d, 450)[1])
        dt = timeit(f, ds, o, d, iters=2)
        print(f"camera spheretrace queued C={lanes}: {dt:.3f}s "
              f"({R/dt/1e3:.1f}k rays/s)")
    S._QUEUE_LANES = 8192

    # 2) march step statistics (host replay on a subsample, lock-step math)
    sub = slice(0, R, 17)
    on, dn = np.asarray(o)[sub], np.asarray(d)[sub]

    def host_march(ds, o, d, maxiter=450):
        f = jax.jit(lambda ds, p, t: S.eval_sdf_scene(ds, p, t)[0])
        t = np.full(o.shape[0], 1e-4, np.float32)
        act = np.ones(o.shape[0], bool)
        steps = np.zeros(o.shape[0], np.int32)
        for i in range(maxiter):
            pcur = o + d * t[:, None]
            dist = np.asarray(f(ds, jnp.asarray(pcur), jnp.asarray(t)))
            hit = act & (np.abs(dist) < 1e-5 * t)  # approx FLT_EPS
            steps[act] += 1
            t = np.where(act & ~hit, np.minimum(t + dist, 1e7), t)
            act = act & ~hit & (t < 1e7)
            if not act.any():
                break
        return steps, t

    steps, t = host_march(ds, on, dn)
    print(f"march steps: mean {steps.mean():.1f} p50 "
          f"{np.percentile(steps, 50):.0f} p95 {np.percentile(steps, 95):.0f} "
          f"max {steps.max()}")

    # 3) per-bounce full-R fixed evals
    hit, tt, kind, idx = jax.jit(
        lambda ds, o, d: S.spheretrace(ds, o, d, 450))(ds, o, d)

    f_norm = jax.jit(lambda ds, pp, tt: S.eval_sdf_normal(ds, pp, tt))
    pos = o + d * tt[:, None]
    print(f"eval_sdf_normal (R, 4 taps): {timeit(f_norm, ds, pos, tt):.4f}s")

    f_re = jax.jit(lambda ds, o, d, tt, hit: S.reattach_t(ds, o, d, tt, hit))
    print(f"reattach_t (2 evals): {timeit(f_re, ds, o, d, tt, hit):.4f}s")

    f_scene = jax.jit(lambda ds, pp, tt: S.eval_sdf_scene(ds, pp, tt)[0])
    print(f"eval_sdf_scene single (R): {timeit(f_scene, ds, pos, tt):.4f}s")

    # analytic-only lock-step trace (the MIS light-pdf march, sdf_id=0)
    f_light = jax.jit(lambda ds, o, d: S.spheretrace(ds, o, d, 450, sdf_id=0)[1])
    print(f"analytic light trace (lock-step, R): "
          f"{timeit(f_light, ds, o, d):.4f}s")

    # 4) one full shader sample for reference
    shade = r._make_shader()
    f_all = jax.jit(lambda ds, o, d: shade(ds, o, d, pix, jnp.int32(0))[0])
    dt = timeit(f_all, ds, o, d, iters=1)
    print(f"full implicit shader sample (b4): {dt:.3f}s "
          f"({R/dt/1e3:.1f}k paths/s)")


if __name__ == "__main__":
    main()
