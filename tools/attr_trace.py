"""Trace the fwd+bwd step AND attribute the hot XLA fusions to source ops.

Extends profile_trace.py: after tracing, pulls the optimized HLO text via
compiled.as_text() and maps each hot op name (fusion.NNNN etc.) to its
metadata op_name / source line, so "fusion.1604 3.9 ms" becomes
"gather from vert_attr at sceneval.py:57".
"""

import argparse
import collections
import glob
import gzip
import json
import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/tests/03_volume/volume.json")
    ap.add_argument("--resolution", type=int, default=360)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--steps", type=int, default=2)
    ap.add_argument("--out", default="/tmp/jaxtrace_attr")
    ap.add_argument("--top", type=int, default=45)
    ap.add_argument("--fwd-only", action="store_true")
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
    if args.fwd_only:
        shade = r._make_shader()
        pix = jnp.arange(r.width * r.height, dtype=jnp.uint32)
        from vpt_tpu.render import state as RS
        o, d = jax.jit(lambda: RS.camera_rays(
            r.ds, 0, r.width, r.height, pix, jnp.int32(0), 64, 1301081))()
        jstep = jax.jit(lambda s: shade(r.ds, o, d, pix, s))
        fargs = (jnp.int32(0),)

        def call(i):
            return jstep(jnp.int32(i))
    else:
        mesh = make_mesh()
        step = make_grad_step(mesh, r._make_shader(), r.width, r.height,
                              total_samples=64)
        params = extract_params(r.ds)
        target = jnp.zeros((r.width * r.height, 3), jnp.float32)
        jstep = jax.jit(step)
        fargs = (r.ds, params, target, jnp.int32(0))

        def call(i):
            return jstep(r.ds, params, target, jnp.int32(i))

    lowered = jstep.lower(*fargs)
    compiled = lowered.compile()
    hlo = compiled.as_text()
    out = call(0)
    jax.block_until_ready(out)

    with jax.profiler.trace(args.out):
        for i in range(args.steps):
            out = call(i + 1)
        jax.block_until_ready(out)

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

    # parse HLO: map op name -> (op_kind, op_name_metadata, source)
    meta = {}
    pat = re.compile(
        r"%?([\w.\-]+) = [^=]*? (\w+)\(.*?metadata=\{([^}]*)\}")
    opname_pat = re.compile(r'op_name="([^"]*)"')
    src_pat = re.compile(r'source_file="([^"]*)".*?source_line=(\d+)')
    for line in hlo.splitlines():
        m = pat.search(line)
        if not m:
            continue
        name, kind, md = m.groups()
        on = opname_pat.search(md)
        sl = src_pat.search(md)
        meta[name] = (
            kind,
            on.group(1) if on else "",
            f"{os.path.basename(sl.group(1))}:{sl.group(2)}" if sl else "")

    print(f"== device timeline, per step ({args.steps} steps) ==")
    for name, d in dur.most_common(args.top):
        kind, on, src = meta.get(name, ("", "", ""))
        on = on[-120:]
        print(f"{d / args.steps / 1e3:9.3f} ms/step x{cnt[name]:4d} "
              f"{name[:28]:28s} {kind:10s} {src:28s} {on}")

    # aggregate leaf ops (exclude region rows like while/jit_step/closed_call)
    regions = ("jit_", "while", "closed_call", "jvp__", "1", "3", "2")
    by_src = collections.Counter()
    by_src_cnt = collections.Counter()
    total = 0.0
    for name, d in dur.items():
        if name in regions or name.startswith("jit_"):
            continue
        kind, on, src = meta.get(name, ("", "", ""))
        is_bwd = "transpose" in on
        key = (src or "<unattributed>") + (" [bwd]" if is_bwd else "")
        by_src[key] += d
        by_src_cnt[key] += cnt[name]
        total += d
    print(f"\n== leaf ops grouped by source line (total "
          f"{total/args.steps/1e3:.1f} ms/step) ==")
    for src, d in by_src.most_common(60):
        print(f"{d/args.steps/1e3:9.3f} ms/step x{by_src_cnt[src]:5d}  {src}")


if __name__ == "__main__":
    main()
