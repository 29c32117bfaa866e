"""Round-5 golden run for tests/03_volume — the one highres scene with full
assets (VERDICT r4 missing #1/#2):

  1. 1280 px / `--spp` (default the FULL published 1024) / bounces 64 vs
     check/highres/03_volume_1280_1024.jpg (scripts/run-highres.sh:3);
  2. lowres refresh: 720 px / 256 spp vs check/lowres/03_volume_720_256.jpg
     (run.sh:8) — the round-1 GOLDEN row was measured at 32 spp.

Writes images + goldens/highres03_summary.json.
"""
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def down4(x):
    h, w = x.shape[0] // 4 * 4, x.shape[1] // 4 * 4
    return x[:h, :w].reshape(h // 4, 4, w // 4, 4, -1).mean((1, 3))


def mae(a, b):
    a, b = down4(a), down4(b)
    h, w = min(a.shape[0], b.shape[0]), min(a.shape[1], b.shape[1])
    return float(np.abs(a[:h, :w] - b[:h, :w]).mean())


def main():
    import argparse

    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=1024)
    args = ap.parse_args()

    import jax.numpy as jnp

    from vpt_tpu.render.state import tonemap
    from vpt_tpu.renderer import Renderer, RenderParams, save_render
    from vpt_tpu.runtime import enable_compile_cache
    from vpt_tpu.scene.jpeg import load_jpeg

    enable_compile_cache()
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "goldens")
    scene = "/root/reference/tests/03_volume/volume.json"
    results = {}
    for tag, res, spp, golden in [
        ("lowres_256", 720, 256,
         "/root/reference/check/lowres/03_volume_720_256.jpg"),
        ("highres", 1280, args.spp,
         "/root/reference/check/highres/03_volume_1280_1024.jpg"),
    ]:
        p = RenderParams(shader="volpathtrace", samples=spp,
                         resolution=res, bounces=64)
        r = Renderer(scene, p)
        t0 = time.time()
        img, _ = r.render(samples=spp)
        wall = time.time() - t0
        srgb = np.asarray(tonemap(jnp.asarray(img)))[..., :3]
        g = load_jpeg(golden)[..., :3]
        m = mae(srgb, g)
        save_render(os.path.join(out, f"03_volume_{tag}.jpg"), img)
        results[tag] = {
            "res": res, "spp": spp, "bounces": 64, "down4_mae": round(m, 5),
            "wall_s": round(wall, 1),
            "paths_per_sec": round(spp * r.width * r.height / wall, 1),
            "compile_s": round(getattr(r, "compile_seconds", 0.0), 1),
            "golden": golden,
        }
        print(tag, results[tag], flush=True)
    with open(os.path.join(out, "highres03_summary.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
