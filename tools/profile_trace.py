"""Capture a jax.profiler device trace of the differentiable render step
and print the top time sinks (the tool behind PERF.md §2's findings).

Usage:
  python tools/profile_trace.py [--scene tests/03_volume/volume.json]
      [--resolution 360] [--bounces 8] [--steps 3] [--out /tmp/jaxtrace]

Prints the per-step duration of every XLA op/region on the device timeline,
largest first. Reading guide: `while.*` are the bounce scans (forward and
backward), `cond.*` minus its `branch_*` children is pure conditional copy
overhead, `fusion.*` are XLA-fused elementwise/gather regions.
"""

import argparse
import collections
import glob
import gzip
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/tests/03_volume/volume.json")
    ap.add_argument("--resolution", type=int, default=360)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--steps", type=int, default=3)
    ap.add_argument("--out", default="/tmp/jaxtrace")
    ap.add_argument("--top", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    from vpt_tpu.parallel.mesh import (
        extract_params, make_grad_step, make_mesh,
    )
    from vpt_tpu.renderer import RenderParams, Renderer
    from vpt_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    r = Renderer(args.scene, RenderParams(
        shader="volpathtrace", samples=64, resolution=args.resolution,
        bounces=args.bounces))
    mesh = make_mesh()
    step = make_grad_step(mesh, r._make_shader(), r.width, r.height,
                          total_samples=64)
    params = extract_params(r.ds)
    target = jnp.zeros((r.width * r.height, 3), jnp.float32)
    jstep = jax.jit(step)
    loss, npp = jstep(r.ds, params, target, jnp.int32(0))
    jax.block_until_ready((loss, npp))

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            loss, npp = jstep(r.ds, params, target, jnp.int32(i + 1))
        jax.block_until_ready((loss, npp))

    traces = sorted(glob.glob(
        os.path.join(args.out, "plugins/profile/*/*.trace.json.gz")))
    with gzip.open(traces[-1]) as f:
        tr = json.load(f)
    ev = tr["traceEvents"]
    pids = {e["pid"]: e["args"].get("name", "") for e in ev
            if e.get("ph") == "M" and e.get("name") == "process_name"}
    dur = collections.Counter()
    cnt = collections.Counter()
    for e in ev:
        if e.get("ph") == "X" and "dur" in e:
            if "TPU" not in pids.get(e.get("pid"), ""):
                continue
            dur[e["name"]] += e["dur"]
            cnt[e["name"]] += 1
    print(f"== device timeline, per step ({args.steps} steps traced) ==")
    for name, d in dur.most_common(args.top):
        print(f"{d / args.steps / 1e3:9.3f} ms/step  x{cnt[name]:5d}  "
              f"{name[:95]}")


if __name__ == "__main__":
    main()
