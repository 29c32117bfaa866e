"""Render the reference's highres config (scripts/run-highres.sh: 1280 px)
for 01_surface and 05_head1ss, compare against check/highres goldens, and
record wall-clock + peak HBM. Writes images + a JSON summary under goldens/.

The published config uses 1024 spp (4096 for 05); pass --spp to time-bound.
"""
import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def down4(x):
    h, w = x.shape[0] // 4 * 4, x.shape[1] // 4 * 4
    return x[:h, :w].reshape(h // 4, 4, w // 4, 4, -1).mean((1, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--spp", type=int, default=256)
    ap.add_argument("--out", default=os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "goldens"))
    args = ap.parse_args()

    import jax

    from vpt_tpu.renderer import Renderer, RenderParams, save_render
    from vpt_tpu.render.state import tonemap
    from vpt_tpu.runtime import enable_compile_cache
    from vpt_tpu.scene.jpeg import load_jpeg
    import jax.numpy as jnp

    enable_compile_cache()
    CONFIGS = [
        ("01_surface", "surface.json", "pathtrace", 4),
        ("05_head1ss", "head1ss.json", "volpathtrace", 64),
    ]
    results = {}
    for scene, json_name, shader, bounces in CONFIGS:
        path = f"/root/reference/tests/{scene}/{json_name}"
        p = RenderParams(shader=shader, samples=args.spp, resolution=1280,
                         bounces=bounces)
        t0 = time.time()
        r = Renderer(path, p)
        t_load = time.time() - t0
        t0 = time.time()
        img, _ = r.render(samples=args.spp)
        t_render = time.time() - t0
        try:
            stats = jax.local_devices()[0].memory_stats() or {}
            peak = stats.get("peak_bytes_in_use", 0)
        except Exception:
            peak = 0
        srgb = np.asarray(tonemap(jnp.asarray(img)))[..., :3]
        out_jpg = os.path.join(args.out, f"{scene}_1280_{args.spp}.jpg")
        save_render(out_jpg, img)
        golden = load_jpeg(
            f"/root/reference/check/highres/{scene}_1280_1024.jpg")
        mae = float(np.abs(down4(srgb) - down4(golden)).mean())
        results[scene] = {
            "resolution": 1280, "spp": args.spp, "shader": shader,
            "bounces": bounces, "load_s": round(t_load, 1),
            "render_s": round(t_render, 1),
            "paths_per_sec": round(args.spp * r.width * r.height / t_render, 1),
            "peak_hbm_gb": round(peak / 2**30, 2),
            "compile_s": round(getattr(r, "compile_seconds", 0.0), 1),
            "down4_mae_vs_check_highres": round(mae, 4),
            "image": out_jpg,
        }
        print(json.dumps({scene: results[scene]}))
    with open(os.path.join(args.out, "highres_summary.json"), "w") as f:
        json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
