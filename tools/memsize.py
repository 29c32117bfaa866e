"""Compile-time HBM footprint of the production pool program at several
resolutions (VERDICT r4 weak #7: device memory_stats are not exposed
through the remote-TPU tunnel, so the "no OOM at 1280 px" claim was
existence-only). XLA's compiled memory_analysis is exact about what the
program will reserve: arguments + outputs + temporaries + code, measured
here without running anything.

Usage: python tools/memsize.py [--scene .../volume.json] [--res 720 1280 2560]
"""
import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene",
                    default="/root/reference/tests/03_volume/volume.json")
    ap.add_argument("--res", type=int, nargs="+", default=[720, 1280, 2560])
    ap.add_argument("--bounces", type=int, default=64)
    args = ap.parse_args()

    import jax.numpy as jnp

    from vpt_tpu.render import pool as PL
    from vpt_tpu.renderer import Renderer, RenderParams
    from vpt_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    rows = {}
    for res in args.res:
        p = RenderParams(shader="volpathtrace", samples=256, resolution=res,
                         bounces=args.bounces)
        r = Renderer(args.scene, p)
        cfg = r._pool_config()
        step = r._get_pool_step(cfg, r._pool_batch(256), False, 32)
        P = r.width * r.height
        pst = PL.init_pool_state(min(P, 1 << 20), P)
        compiled = step.lower(r.ds, pst, jnp.int32(0)).compile()
        ma = compiled.memory_analysis()
        row = {}
        for k in ("argument_size_in_bytes", "output_size_in_bytes",
                  "temp_size_in_bytes", "generated_code_size_in_bytes",
                  "alias_size_in_bytes"):
            v = getattr(ma, k, None)
            if v is not None:
                row[k.replace("_in_bytes", "_mb")] = round(v / 2**20, 1)
        total = sum(getattr(ma, k, 0) or 0 for k in (
            "argument_size_in_bytes", "output_size_in_bytes",
            "temp_size_in_bytes", "generated_code_size_in_bytes"))
        aliased = getattr(ma, "alias_size_in_bytes", 0) or 0
        row["peak_hbm_gb_est"] = round((total - aliased) / 2**30, 3)
        row["pixels"] = P
        rows[str(res)] = row
        print(res, json.dumps(row), flush=True)
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "goldens", "memsize.json")
    with open(out, "w") as f:
        json.dump(rows, f, indent=1)


if __name__ == "__main__":
    main()
