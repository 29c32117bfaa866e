"""Preetham sun-sky vs the reference library's own make_sunsky output
(goldens/sunsky_*.hdr, dumped from yocto::make_sunsky — see goldens/README).
Tolerances cover RGBE .hdr quantization only."""

import os

import numpy as np

from vpt_tpu.scene.image_io import load_hdr
from vpt_tpu.scene.sunsky import add_sky, make_sunsky

GOLDENS = os.path.join(os.path.dirname(os.path.dirname(__file__)), "goldens")


def _check(path, **args):
    ref = load_hdr(os.path.join(GOLDENS, path))[..., :3]
    ours = make_sunsky(256, 128, **args)[..., :3]
    rel = np.abs(ours - ref) / (np.abs(ref) + 1e-4)
    assert rel.max() < 0.05, f"max rel err {rel.max():.4f}"
    assert rel.mean() < 0.01


def test_sunsky_matches_reference_dump():
    _check("sunsky_a0.6_t3.hdr", sun_angle=0.6)


def test_sunsky_with_sun_disk_matches():
    _check("sunsky_a1.1_t5_sun.hdr", sun_angle=1.1, turbidity=5.0,
           has_sun=True, ground_albedo=(0, 0, 0))


def test_add_sky_appends_texture_and_environment():
    from vpt_tpu.scene.schema import HostScene

    s = HostScene()
    add_sky(s, 0.7)
    assert len(s.textures) == 1 and s.textures[0].linear
    assert s.textures[0].pixels.shape == (512, 1024, 4)
    assert len(s.environments) == 1
    assert s.environments[0].emission_tex == 0
    # sky half is lit, ground half constant
    px = s.textures[0].pixels
    assert px[:256, :, :3].mean() > px[256:, :, :3].mean()
    assert np.ptp(px[300:, :, 0]) < 1e-6
