"""Print the measured down4 MAE of every golden row (the numbers behind
test_golden.py's thresholds) — used to keep thresholds tight (~1.3x the
measured value) instead of the round-3 ~2x headroom."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    sys.path.insert(0, os.path.join(os.path.dirname(
        os.path.dirname(os.path.abspath(__file__))), "tests"))
    os.environ["VPT_TPU_TESTS"] = "1"
    import test_golden as G

    from vpt_tpu.scene.image_io import load_png
    from vpt_tpu.scene.jpeg import load_jpeg

    rows = []
    for scene, json_name, shader, bounces, spp, thresh in [
        ("01_surface", "surface.json", "pathtrace", 4, 16, 0.035),
        ("03_volume", "volume.json", "volpathtrace", 8, 16, 0.045),
    ]:
        srgb = G._render(os.path.join(G.REF, scene, json_name), shader, spp,
                         360, bounces)
        golden = load_jpeg(
            os.path.join(G.CHECK, f"{scene}_720_256.jpg"))[..., :3]
        g2 = golden.reshape(golden.shape[0] // 2, 2,
                            golden.shape[1] // 2, 2, 3).mean((1, 3))
        rows.append((f"{scene} lowres", G._mae_vs_golden(srgb, g2), thresh))

    for scene, json_name, golden, thresh in [
        ("06_gridsdf", "gridsdf.json", "ref06_implicit_180_8spp.png", 0.04),
        ("07_sdfunction", "sdfunction.json", "ref07_implicit_180_8spp.png",
         0.04),
    ]:
        srgb = G._render(os.path.join(G.REF, scene, json_name), "implicit",
                         8, 180, 4)
        gimg = load_png(os.path.join(G.GOLDENS, golden))[..., :3]
        rows.append((f"{scene} implicit", G._mae_vs_golden(srgb, gimg),
                     thresh))

    for name, shader, bounces, golden, thresh in [
        ("02_rollingteapot", "pathtrace", 4, "ref02_pathtrace_360_64spp.png",
         0.020),
        ("04_head1", "pathtrace", 4, "ref04_pathtrace_360_64spp.png", 0.015),
        ("05_head1ss", "volpathtrace", 64,
         "ref05_volpathtrace_360_64spp.png", 0.045),
        ("nested_media", "volpathtrace", 8,
         "refnested_volpathtrace_360_64spp.png", 0.030),
    ]:
        scene_path = os.path.join(G.GOLDENS, "standins", name, "scene.json")
        srgb = G._render(scene_path, shader, 64, 360, bounces)
        gimg = load_png(os.path.join(G.GOLDENS, golden))[..., :3]
        rows.append((f"{name} oracle", G._mae_vs_golden(srgb, gimg), thresh))

    for name, mae, thresh in rows:
        print(f"{name:28s} mae {mae:.4f}  thresh {thresh}  "
              f"headroom {thresh/max(mae,1e-9):.2f}x")


if __name__ == "__main__":
    main()
