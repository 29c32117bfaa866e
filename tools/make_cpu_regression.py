"""Generate the CPU regression goldens: tiny fixed-seed renders of real
reference scenes, one per integrator family, checked in under
goldens/cpu_regression/. tests/test_regression.py re-renders and compares
at tight tolerance so a shading/light/volume formula change fails the CPU
suite (VERDICT r3 ask #5 — previously only a normal-AOV test touched real
scenes on CPU)."""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np

OUT = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                   "goldens", "cpu_regression")

# (name, scene, shader, resolution, spp, bounces)
CONFIGS = [
    ("03_volpathtrace", "/root/reference/tests/03_volume/volume.json",
     "volpathtrace", 64, 4, 8),
    ("03_pathtrace", "/root/reference/tests/03_volume/volume.json",
     "pathtrace", 64, 4, 4),
    ("03_naive", "/root/reference/tests/03_volume/volume.json",
     "naive", 64, 4, 4),
    ("03_eyelight", "/root/reference/tests/03_volume/volume.json",
     "eyelight", 64, 2, 4),
    ("01_pathtrace", "/root/reference/tests/01_surface/surface.json",
     "pathtrace", 64, 4, 4),
    ("06_implicit", "/root/reference/tests/06_gridsdf/gridsdf.json",
     "implicit", 64, 2, 4),
    ("06_implicit_normal", "/root/reference/tests/06_gridsdf/gridsdf.json",
     "implicit_normal", 64, 1, 4),
]


def render_one(scene, shader, resolution, spp, bounces):
    from vpt_tpu.renderer import Renderer, RenderParams

    p = RenderParams(shader=shader, samples=spp, resolution=resolution,
                     bounces=bounces, spheretrace_maxiter=450)
    r = Renderer(scene, p, devices=1)
    img, _ = r.render(samples=spp)
    return np.asarray(img, np.float32)


def main():
    os.makedirs(OUT, exist_ok=True)
    for name, scene, shader, res, spp, bounces in CONFIGS:
        img = render_one(scene, shader, res, spp, bounces)
        np.savez_compressed(os.path.join(OUT, f"{name}.npz"), img=img)
        print(f"{name}: {img.shape} mean {img[..., :3].mean():.5f}")


if __name__ == "__main__":
    main()
