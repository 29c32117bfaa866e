"""Golden-image threshold tests against the reference renderer's output.

TPU-marked: run with `VPT_TPU_TESTS=1 python -m pytest tests/test_golden.py`
on a machine with the TPU backend (the default CPU suite skips these — a
720p path-traced render is not CPU-test material). Thresholds are set from
the measured round-2 results in GOLDEN.md with ~2x headroom; they catch
structural regressions (shading, BVH, SDF, tonemap), not MC noise.

Scenes 01-05 compare against /root/reference/check/lowres/*.jpg on a
4x-box-downsampled grid; scenes 06/07 compare against the reference
renderer's own output on this repo's synthesized voxel grids
(goldens/README.md).
"""

import os

import numpy as np
import pytest

import jax

pytestmark = pytest.mark.skipif(
    jax.default_backend() not in ("tpu", "axon"),
    reason="golden renders run on TPU only (VPT_TPU_TESTS=1)")

REF = "/root/reference/tests"
CHECK = "/root/reference/check/lowres"
GOLDENS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "goldens")


def _down(img, k=4):
    h, w = img.shape[0] // k * k, img.shape[1] // k * k
    return img[:h, :w].reshape(h // k, k, w // k, k, 3).mean((1, 3))


def _render(scene, shader, samples, resolution, bounces, maxiter=200):
    from vpt_tpu.render.state import tonemap
    from vpt_tpu.renderer import RenderParams, Renderer

    import jax.numpy as jnp

    params = RenderParams(shader=shader, samples=samples,
                          resolution=resolution, bounces=bounces,
                          spheretrace_maxiter=maxiter)
    r = Renderer(scene, params)
    img, _ = r.render(chunk=8)
    return np.asarray(tonemap(jnp.asarray(img)))[..., :3]


def _mae_vs_golden(srgb, golden):
    a, b = _down(srgb), _down(golden)
    h, w = min(a.shape[0], b.shape[0]), min(a.shape[1], b.shape[1])
    return float(np.abs(a[:h, :w] - b[:h, :w]).mean())


@pytest.mark.parametrize("scene,json_name,shader,bounces,spp,thresh", [
    ("01_surface", "surface.json", "pathtrace", 4, 16, 0.024),
    ("03_volume", "volume.json", "volpathtrace", 8, 16, 0.040),
])
def test_golden_lowres(scene, json_name, shader, bounces, spp, thresh):
    from vpt_tpu.scene.jpeg import load_jpeg

    srgb = _render(os.path.join(REF, scene, json_name), shader, spp, 360,
                   bounces)
    golden = load_jpeg(os.path.join(CHECK, f"{scene}_720_256.jpg"))[..., :3]
    g2 = golden.reshape(golden.shape[0] // 2, 2,
                        golden.shape[1] // 2, 2, 3).mean((1, 3))
    mae = _mae_vs_golden(srgb, g2)
    assert mae < thresh, f"{scene}: down4 MAE {mae:.4f} >= {thresh}"


@pytest.mark.parametrize("scene,json_name,golden,thresh", [
    # maxiter 450 = the reference default (yocto_pathtrace.h:98); round-5
    # thresholds ~1.3x the measured MAEs (0.0193 / 0.0206)
    ("06_gridsdf", "gridsdf.json", "ref06_implicit_180_8spp.png", 0.025),
    ("07_sdfunction", "sdfunction.json", "ref07_implicit_180_8spp.png", 0.027),
])
def test_golden_implicit(scene, json_name, golden, thresh):
    from vpt_tpu.scene.image_io import load_png

    srgb = _render(os.path.join(REF, scene, json_name), "implicit", 8, 180,
                   4, maxiter=450)
    ref = load_png(os.path.join(GOLDENS, golden))[..., :3]
    mae = _mae_vs_golden(srgb, ref)
    assert mae < thresh, f"{scene}: down4 MAE {mae:.4f} >= {thresh}"


@pytest.mark.parametrize("name,shader,bounces,golden,thresh", [
    ("02_rollingteapot", "pathtrace", 4,
     "ref02_pathtrace_360_64spp.png", 0.013),
    ("04_head1", "pathtrace", 4,
     "ref04_pathtrace_360_64spp.png", 0.009),
    ("05_head1ss", "volpathtrace", 64,
     "ref05_volpathtrace_360_64spp.png", 0.028),
    ("nested_media", "volpathtrace", 8,
     "refnested_volpathtrace_360_64spp.png", 0.017),
])
def test_golden_standin_oracles(name, shader, bounces, golden, thresh):
    """Apples-to-apples oracles for the asset-limited scenes (round-3 close
    of VERDICT ask #4): the stand-in scene exported by save_json_scene was
    rendered by the compiled C++ reference itself (tools/make_oracles.py);
    both renderers consume the identical export. nested_media additionally
    pins the reference's volume-stack semantics (vstack capped at depth 1,
    yocto_pathtrace.cpp:642-648) against our slot+depth integrator."""
    from vpt_tpu.scene.image_io import load_png

    scene = os.path.join(GOLDENS, "standins", name, "scene.json")
    srgb = _render(scene, shader, 64, 360, bounces)
    ref = load_png(os.path.join(GOLDENS, golden))[..., :3]
    mae = _mae_vs_golden(srgb, ref)
    assert mae < thresh, f"{name}: down4 MAE {mae:.4f} >= {thresh}"


def test_golden_highres_01():
    """The reference's highres config (scripts/run-highres.sh: 1280 px)
    for 01_surface — exercises chunking/memory at 4x the pixel count of the
    lowres rows; full-spp row (256 spp, MAE 0.0148) in GOLDEN.md."""
    from vpt_tpu.scene.jpeg import load_jpeg

    srgb = _render(os.path.join(REF, "01_surface", "surface.json"),
                   "pathtrace", 16, 1280, 4)
    golden = load_jpeg(
        "/root/reference/check/highres/01_surface_1280_1024.jpg")[..., :3]
    mae = _mae_vs_golden(srgb, golden)
    assert mae < 0.035, f"01_surface highres: down4 MAE {mae:.4f}"
