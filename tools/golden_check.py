"""Golden-image comparison against the reference's check/ images.

The reference's own test protocol is visual/statistical comparison of
rendered output vs check/lowres/*.jpg (SURVEY.md §4, readme.md:24-26); the
checked-in out/ images themselves byte-differ from check/ (JPG
nondeterminism + MC noise). This tool renders a tests/ scene with vpt_tpu
and reports sRGB-space error statistics vs the decoded golden JPG at both
full and 4x-box-downsampled resolution (downsampling suppresses per-pixel MC
noise so the comparison measures bias, not variance).

Usage:
  python tools/golden_check.py --scene 03_volume [--samples 64]
      [--resolution 720] [--out /tmp/golden]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

SCENES = {
    "01_surface": ("surface.json", 4),
    "02_rollingteapot": ("rollingteapot.json", 4),
    "03_volume": ("volume.json", 64),
    "04_head1": ("head1.json", 4),
    "05_head1ss": ("head1ss.json", 64),
}
REF = "/root/reference/tests"
CHECK = "/root/reference/check/lowres"


def box_down(img, k=4):
    h, w = img.shape[:2]
    h2, w2 = h // k * k, w // k * k
    img = img[:h2, :w2]
    return img.reshape(h2 // k, k, w2 // k, k, -1).mean((1, 3))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scene", default="03_volume", choices=sorted(SCENES))
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=720)
    ap.add_argument("--out", default="/tmp/golden")
    ap.add_argument("--shader", default=None)
    args = ap.parse_args()

    from vpt_tpu.renderer import RenderParams, Renderer, save_render
    from vpt_tpu.render.state import tonemap
    from vpt_tpu.scene.jpeg import load_jpeg

    json_name, bounces = SCENES[args.scene]
    shader = args.shader or ("volpathtrace" if bounces == 64 else "pathtrace")
    params = RenderParams(shader=shader, samples=args.samples,
                          resolution=args.resolution, bounces=bounces)
    t0 = time.time()
    r = Renderer(os.path.join(REF, args.scene, json_name), params)
    img, _ = r.render(chunk=8)
    render_s = time.time() - t0
    srgb = np.asarray(tonemap(img))[..., :3]

    # load_jpeg already returns float32 in [0,1]
    golden = load_jpeg(os.path.join(CHECK, f"{args.scene}_720_256.jpg"))
    if golden.shape[:2] != srgb.shape[:2]:
        print(f"note: size mismatch render {srgb.shape} vs golden "
              f"{golden.shape}; comparing on 4x-downsampled common grid")
    full_mae = float(np.abs(srgb - golden[..., :3]).mean()) if (
        golden.shape[:2] == srgb.shape[:2]) else None
    a, b = box_down(srgb), box_down(golden[..., :3])
    hh = min(a.shape[0], b.shape[0]); ww = min(a.shape[1], b.shape[1])
    a, b = a[:hh, :ww], b[:hh, :ww]
    down_mae = float(np.abs(a - b).mean())
    down_rmse = float(np.sqrt(((a - b) ** 2).mean()))
    psnr = float(20 * np.log10(1.0 / max(down_rmse, 1e-9)))

    os.makedirs(args.out, exist_ok=True)
    out_png = os.path.join(args.out, f"{args.scene}_{args.samples}spp.png")
    save_render(out_png, img)
    print(json.dumps({
        "scene": args.scene, "shader": shader, "samples": args.samples,
        "resolution": args.resolution, "render_s": round(render_s, 1),
        "full_mae": full_mae, "down4_mae": round(down_mae, 4),
        "down4_rmse": round(down_rmse, 4), "down4_psnr_db": round(psnr, 1),
        "out": out_png,
    }))


if __name__ == "__main__":
    main()
