"""Worker process for the multi-host distributed test/benchmark.

Launched N times (tests/test_distributed.py, tools/scaling_bench.py
--multihost) with argv: coordinator num_processes process_id scene_json
out_npz [local_devices]. Each process joins the jax.distributed runtime
over the gloo CPU transport, builds the GLOBAL mesh spanning every
process's virtual devices, runs one differentiable render step
(parallel/mesh.py make_grad_step: rays sharded across the world, scene and
params replicated, psum'd gradients), and process 0 writes the loss +
updated parameters for the parent to compare against a single-process run.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    coordinator, num_procs, pid, scene_path, out_npz = sys.argv[1:6]
    local_devices = sys.argv[6] if len(sys.argv) > 6 else "4"
    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                               + f" --xla_force_host_platform_device_count={local_devices}")
    import jax

    jax.config.update("jax_platforms", "cpu")
    jax.config.update("jax_cpu_collectives_implementation", "gloo")
    import numpy as np

    from vpt_tpu.parallel.mesh import (
        extract_params, init_distributed, make_grad_step, make_mesh,
    )
    from vpt_tpu.renderer import Renderer, RenderParams

    init_distributed(coordinator, int(num_procs), int(pid))
    assert jax.process_count() == int(num_procs)
    world = len(jax.devices())

    params_r = RenderParams(shader="volpathtrace", samples=4, resolution=64,
                            bounces=3)
    r = Renderer(scene_path, params_r, devices=1)
    mesh = make_mesh()  # global mesh over all processes' devices
    shade = r._make_shader()
    # pad pixel count to the world size
    import jax.numpy as jnp

    step = make_grad_step(mesh, shade, r.width, r.height,
                          total_samples=params_r.samples)
    params = extract_params(r.ds)
    target = jnp.zeros((r.width * r.height, 3), jnp.float32)

    if len(sys.argv) > 7 and sys.argv[7] == "bench":
        # fwd+bwd throughput over the GLOBAL mesh (scaling_bench
        # --multihost): time K grad steps (the production differentiable
        # step — rays sharded, grads psum'd), process 0 writes paths/s
        import time

        jstep = jax.jit(step)
        loss, _ = jstep(r.ds, params, target, jnp.int32(0))
        float(jax.device_get(loss))
        iters = 3
        t0 = time.time()
        for i in range(iters):
            loss, _ = jstep(r.ds, params, target, jnp.int32(i + 1))
        float(jax.device_get(loss))
        dt = time.time() - t0
        pps = iters * r.width * r.height / dt
        if int(pid) == 0:
            np.savez(out_npz, paths_per_sec=np.float32(pps),
                     world=np.int32(world))
        print(f"[proc {pid}] world={world} {pps:,.0f} paths/s", flush=True)
        return

    loss, new_params = jax.jit(step)(r.ds, params, target, jnp.int32(0))
    loss = float(loss)
    if int(pid) == 0:
        flat = {k: np.asarray(jax.device_get(v))
                for k, v in new_params.items()}
        np.savez(out_npz, loss=np.float32(loss), world=np.int32(world),
                 **flat)
    # all processes must stay alive until the collective finishes
    jax.effects_barrier()
    print(f"[proc {pid}] world={world} loss={loss:.6f}", flush=True)


if __name__ == "__main__":
    main()
