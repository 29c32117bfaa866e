"""Round-5 implicit-shader experiment: measure the K-tap + hoisted-rows +
escape-short-circuit + sample-batched render on the bench config."""

import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


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
    K = ds.vi_tap_cap.shape[0] if ds.vi_tap_cap is not None else -1
    print(f"R={R} K={K} vi_aabb={None if ds.vi_aabb is None else ds.vi_aabb.shape}")

    Sb = 8
    pix = jnp.tile(jnp.arange(R, dtype=jnp.uint32), Sb)
    samp = jnp.repeat(jnp.arange(Sb, dtype=jnp.int32), R)
    o, d = jax.jit(lambda ds: RS.camera_rays(
        ds, 0, W, H, pix, samp, 16, 1301081))(ds)

    def timeit(fn, *args, iters=2):
        out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        t0 = time.time()
        for _ in range(iters):
            out = fn(*args)
        float(np.asarray(jax.tree.leaves(out)[0]).reshape(-1)[0])
        return (time.time() - t0) / iters

    # batched 8-sample camera trace at several queue widths
    for lanes in (8192, 16384, 32768, 65536):
        S._QUEUE_LANES = lanes

        def f(ds, o, d):
            ds = S.attach_cell_rows(ds)
            return S.spheretrace(ds, o, d, 450)[1]

        dt = timeit(jax.jit(f), ds, o, d)
        print(f"8-sample camera trace C={lanes}: {dt:.3f}s "
              f"({Sb*R/dt/1e3:.1f}k rays/s)")
    S._QUEUE_LANES = 8192

    # end-to-end bench_implicit equivalent
    r2 = Renderer("/root/reference/tests/06_gridsdf/gridsdf.json", p)
    r2.render(samples=8, chunk=8)
    t0 = time.time()
    r2.render(samples=8, chunk=8)
    dt = time.time() - t0
    print(f"implicit render 8spp chunk=8: {dt:.2f}s "
          f"({8*R/dt/1e3:.1f}k paths/s; target >=96k)")


if __name__ == "__main__":
    main()
