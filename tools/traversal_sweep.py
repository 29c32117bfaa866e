"""One fwd+bwd timing at the current VPT_PALLAS_BLOCK_ROWS / VPT_PALLAS_POPS
(env-read at ops.bvh_pallas import). Sweep driver:

  for br in 16 32 64; do for p in 1 2 4; do
    VPT_PALLAS_BLOCK_ROWS=$br VPT_PALLAS_POPS=$p python tools/traversal_sweep.py
  done; done
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import numpy as np

    import jax
    import jax.numpy as jnp

    from vpt_tpu.parallel.mesh import extract_params, make_grad_step, make_mesh
    from vpt_tpu.renderer import Renderer, RenderParams
    from vpt_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    p = RenderParams(shader="volpathtrace", samples=64, resolution=360,
                     bounces=8)
    r = Renderer("/root/reference/tests/03_volume/volume.json", p)
    S = int(os.environ.get("VPT_SWEEP_S", "8"))
    mesh = make_mesh()
    shade = r._make_shader()
    step = make_grad_step(mesh, shade, r.width, r.height,
                          total_samples=p.samples, samples_per_step=S)
    params = extract_params(r.ds)
    target = jnp.zeros((r.width * r.height, 3), jnp.float32)
    jstep = jax.jit(step)
    loss, _ = jstep(r.ds, params, target, jnp.int32(0))
    float(np.asarray(loss))
    iters = 4
    t0 = time.time()
    for i in range(iters):
        loss, _ = jstep(r.ds, params, target, jnp.int32(i + 1))
    float(np.asarray(loss))
    dt = time.time() - t0
    print(json.dumps({
        "block_rows": int(os.environ.get("VPT_PALLAS_BLOCK_ROWS", 32)),
        "pops": int(os.environ.get("VPT_PALLAS_POPS", 2)),
        "S": S,
        "fwdbwd_paths_per_sec": round(iters * S * r.width * r.height / dt, 1),
    }))


if __name__ == "__main__":
    main()
