"""CPU regression pins: tiny fixed-seed renders of REAL reference scenes,
one per integrator family, against goldens rendered by this repo
(tools/make_cpu_regression.py). These are regression pins, not parity
claims — the TPU golden suite (test_golden.py) compares against the
reference's check images; THIS suite makes the CPU-only CI fail if a
BSDF/light/volume/SDF formula changes (VERDICT r3: a Fresnel sign flip
would previously pass CPU CI).

Tolerance: identical platform + seed should reproduce to float round-off;
rtol 1e-4 absorbs XLA fusion-placement drift across versions while any real
shading change (wrong lobe, flipped sign, wrong pdf) lands far outside it.
"""

import os

import numpy as np
import pytest

GOLD = os.path.join(os.path.dirname(os.path.dirname(__file__)),
                    "goldens", "cpu_regression")

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


@pytest.mark.parametrize(
    "name,scene,shader,res,spp,bounces", CONFIGS,
    ids=[c[0] for c in CONFIGS])
def test_cpu_regression(name, scene, shader, res, spp, bounces):
    from vpt_tpu.renderer import Renderer, RenderParams

    ref = np.load(os.path.join(GOLD, f"{name}.npz"))["img"]
    p = RenderParams(shader=shader, samples=spp, resolution=res,
                     bounces=bounces, spheretrace_maxiter=450)
    r = Renderer(scene, p, devices=1)
    img, _ = r.render(samples=spp)
    np.testing.assert_allclose(
        np.asarray(img), ref, rtol=1e-4, atol=1e-5,
        err_msg=f"{name}: CPU render drifted from the checked-in "
                "regression golden (regenerate deliberately with "
                "tools/make_cpu_regression.py if the change is intended)")
