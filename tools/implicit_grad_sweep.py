"""Sweep samples_per_step (S) for the differentiable implicit path.

Round 5 found the forward implicit shader was queue-starved at one sample
per dispatch (PERF.md round-5 table) and sample-batching was the largest
single lever (~3x). The differentiable row (BENCH extra
implicit_fwdbwd_grid_grads_paths_per_sec) runs make_grad_step at S=2;
this sweep asks whether the same lever applies through AD, where the
limit is grad-residual HBM rather than queue occupancy.

Usage: python tools/implicit_grad_sweep.py [S ...]  (default 2 4 8)
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def bench_s(S: int) -> float:
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vpt_tpu.parallel.mesh import extract_params, make_grad_step, make_mesh
    from vpt_tpu.renderer import Renderer, RenderParams

    p = RenderParams(shader="implicit", samples=16, resolution=360,
                     bounces=4, spheretrace_maxiter=450)
    r = Renderer("/root/reference/tests/06_gridsdf/gridsdf.json", p)
    mesh = make_mesh()
    shade = r._make_shader()
    step = make_grad_step(mesh, shade, r.width, r.height,
                          total_samples=p.samples, samples_per_step=S)
    params = extract_params(r.ds)
    target = jnp.zeros((r.width * r.height, 3), jnp.float32)
    jstep = jax.jit(step)
    loss, _ = jstep(r.ds, params, target, jnp.int32(0))
    float(np.asarray(loss))
    iters = 3
    t0 = time.time()
    for i in range(iters):
        loss, _ = jstep(r.ds, params, target, jnp.int32(i + 1))
    float(np.asarray(loss))
    dt = time.time() - t0
    return iters * S * r.width * r.height / dt


def main():
    from vpt_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    svals = [int(a) for a in sys.argv[1:]] or [2, 4, 8]
    for S in svals:
        try:
            rate = bench_s(S)
            print(f"S={S}: {rate:,.1f} paths/s", flush=True)
        except Exception as e:  # OOM etc. — report and keep sweeping
            print(f"S={S}: FAILED ({type(e).__name__}: {e})", flush=True)


if __name__ == "__main__":
    main()
