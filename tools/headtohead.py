"""Full lowres head-to-head: the reference's run.sh config (scenes 01-05,
720 px, 256 spp; volpathtrace b64 for 03/05) plus 06/07 implicit — BOTH
renderers, wall-clock + apples-to-apples MAE per scene (VERDICT r4 #10).

Protocol:
  - reference = the in-session compiled C++ binary (/tmp/ref/bin/ypathtrace,
    2-core host, default threads). Scenes whose assets are missing upstream
    (01/02/04/05 — GOLDEN.md) run on THIS repo's exported stand-in scenes
    (goldens/standins/*, save_json_scene) so both renderers consume an
    identical file set; 03 runs the real scene. 06/07 run a /tmp copy of
    the scene with this repo's synthesized .sdf grids.
  - ours = warm pool render on the TPU (compile excluded and reported).
  - MAE = down4 sRGB vs the reference's own output from this run.

Writes goldens/headtohead_r5.json.
"""
import json
import os
import shutil
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = "/tmp/ref/bin/ypathtrace"
OUT = os.path.join(REPO, "goldens", "h2h")

# name -> (our_scene, ref_scene_or_None, shader, res, spp, bounces, maxiter)
ROWS = [
    ("01_surface", "tests/01_surface/surface.json", "standin",
     "pathtrace", 720, 256, 4, None),
    ("02_rollingteapot", "tests/02_rollingteapot/rollingteapot.json",
     "standin", "pathtrace", 720, 256, 4, None),
    ("03_volume", "tests/03_volume/volume.json", "real",
     "volpathtrace", 720, 256, 64, None),
    ("04_head1", "tests/04_head1/head1.json", "standin",
     "volpathtrace", 720, 256, 4, None),
    ("05_head1ss", "tests/05_head1ss/head1ss.json", "standin",
     "volpathtrace", 720, 256, 64, None),
    ("06_gridsdf", "tests/06_gridsdf/gridsdf.json", "sdfcopy",
     "implicit", 360, 16, 4, 450),
    ("07_sdfunction", "tests/07_sdfunction/sdfunction.json", "sdfcopy",
     "implicit", 360, 16, 4, 450),
]


def down4(x):
    h, w = x.shape[0] // 4 * 4, x.shape[1] // 4 * 4
    return x[:h, :w].reshape(h // 4, 4, w // 4, 4, -1).mean((1, 3))


def mae(a, b):
    a, b = down4(a), down4(b)
    h, w = min(a.shape[0], b.shape[0]), min(a.shape[1], b.shape[1])
    return float(np.abs(a[:h, :w] - b[:h, :w]).mean())


def ensure_standin(name):
    p = os.path.join(REPO, "goldens", "standins", name, "scene.json")
    if os.path.exists(p):
        return p
    sys.path.insert(0, os.path.join(REPO, "tools"))
    from make_oracles import export_scene

    return export_scene(name)


def ensure_sdf_copy(name, our_scene):
    """Copy the 06/07 scene + this repo's synthesized grids to /tmp (the
    reference dir must not be written)."""
    src_dir = os.path.dirname(os.path.join("/root/reference", our_scene))
    dst = os.path.join("/tmp", "h2h_scenes", name)
    if not os.path.exists(dst):
        shutil.copytree(src_dir, dst)
        sdst = os.path.join(dst, "sdfs")
        os.makedirs(sdst, exist_ok=True)
        cache = os.path.join(REPO, ".cache", "sdfs")
        for f in os.listdir(cache):
            shutil.copy(os.path.join(cache, f), sdst)
    return os.path.join(dst, os.path.basename(our_scene))


def run_reference(scene_json, out_png, shader, res, spp, bounces, maxiter):
    cmd = [REF_BIN, "--scene", scene_json, "--output", out_png,
           "--shader", shader, "--resolution", str(res),
           "--samples", str(spp), "--bounces", str(bounces)]
    if maxiter is not None:
        cmd += ["--stmaxiter", str(maxiter)]
    t0 = time.time()
    subprocess.run(cmd, check=True, timeout=4 * 3600,
                   stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL)
    return time.time() - t0


def main():
    import jax.numpy as jnp

    from vpt_tpu.render.state import tonemap
    from vpt_tpu.renderer import Renderer, RenderParams, save_render
    from vpt_tpu.runtime import enable_compile_cache
    from vpt_tpu.scene.image_io import load_png
    from vpt_tpu.scene.jpeg import load_jpeg

    only = set(sys.argv[1:])
    enable_compile_cache()
    os.makedirs(OUT, exist_ok=True)
    results = {}
    sumpath = os.path.join(REPO, "goldens", "headtohead_r5.json")
    if os.path.exists(sumpath):
        results = json.load(open(sumpath))
    for name, our_scene, ref_mode, shader, res, spp, bounces, maxiter in ROWS:
        if only and name not in only:
            continue
        row = {"config": f"{shader} {res}px {spp}spp b{bounces}"
               + (f" maxiter{maxiter}" if maxiter else "")}
        # reference side
        if ref_mode == "real":
            ref_scene = os.path.join("/root/reference", our_scene)
        elif ref_mode == "standin":
            ref_scene = ensure_standin(name)
        else:
            ref_scene = ensure_sdf_copy(name, our_scene)
        ref_png = os.path.join(OUT, f"{name}_ref.png")
        ref_wall = run_reference(
            ref_scene, ref_png, shader, res, spp, bounces, maxiter)
        ref_img = load_png(ref_png)[..., :3]
        npx = ref_img.shape[0] * ref_img.shape[1]
        row["ref"] = {"scene": os.path.relpath(ref_scene, "/"),
                      "wall_s": round(ref_wall, 1),
                      "paths_per_sec": round(spp * npx / ref_wall, 1)}
        # our side: same scene file the reference consumed (identical
        # assets) — warm render, compile reported separately
        p = RenderParams(shader=shader, samples=spp, resolution=res,
                         bounces=bounces,
                         spheretrace_maxiter=maxiter or 450)
        r = Renderer(ref_scene, p)
        chunk = 8
        # warm at the FULL spp: the pool program is keyed by the sample
        # batch size, so a small-spp warm-up would leave the timed run
        # paying a compile for the real batch
        r.render(samples=spp, chunk=chunk)
        t0 = time.time()
        img, _ = r.render(samples=spp, chunk=chunk)
        wall = time.time() - t0
        srgb = np.asarray(tonemap(jnp.asarray(img)))[..., :3]
        save_render(os.path.join(OUT, f"{name}_ours.png"), img)
        row["ours"] = {"wall_s": round(wall, 1),
                       "paths_per_sec": round(spp * r.width * r.height / wall, 1),
                       "compile_s": round(getattr(r, "compile_seconds", 0.0), 1)}
        row["speedup_wall"] = round(ref_wall / wall, 2)
        row["down4_mae_vs_ref"] = round(mae(srgb, ref_img), 5)
        # where the upstream check golden is apples-to-apples, add it
        if name in ("01_surface", "03_volume") and ref_mode != "standin":
            g = load_jpeg(
                f"/root/reference/check/lowres/{name}_720_256.jpg")[..., :3]
            row["down4_mae_vs_check"] = round(mae(srgb, g), 5)
        results[name] = row
        print(name, json.dumps(row), flush=True)
        with open(sumpath, "w") as f:
            json.dump(results, f, indent=1)


if __name__ == "__main__":
    main()
