"""Renderer-level tests: progressive state, checkpoint/resume, tonemap,
image IO round-trips. CPU-sized (tiny resolutions, procedural test scene)."""

import numpy as np
import pytest

from vpt_tpu.renderer import RenderParams, Renderer
from vpt_tpu.scene.testing import make_test_scene


@pytest.fixture(scope="module")
def renderer():
    params = RenderParams(shader="pathtrace", samples=4, resolution=48,
                          bounces=3)
    return Renderer(make_test_scene(sphere_steps=8, with_volume=False), params)


def test_progressive_equals_oneshot(renderer):
    img1, st1 = renderer.render(samples=4, chunk=1)
    img2, st2 = renderer.render(samples=4, chunk=4)
    np.testing.assert_allclose(img1, img2, rtol=1e-5, atol=1e-6)


def test_checkpoint_resume_bit_identical(tmp_path, renderer):
    ck = str(tmp_path / "state.npz")
    # uninterrupted render
    img_full, _ = renderer.render(samples=4, chunk=2)
    # interrupted: 2 samples, checkpoint, then resume for 2 more
    _, st = renderer.render(samples=2, chunk=2, checkpoint=ck)
    img_res, st2 = renderer.render(samples=4, chunk=2, checkpoint=ck)
    assert int(st2.samples) == 4
    np.testing.assert_allclose(img_full, img_res, rtol=1e-6, atol=1e-7)


def test_sharded_render_bit_identical_to_single_device():
    """Pixels sharded over the 8-device CPU mesh must reproduce the
    single-device image exactly (counter-based per-pixel RNG; the pixel
    count 540 is deliberately not divisible by 8 to exercise padding)."""
    import jax

    n = len(jax.devices())
    assert n >= 2  # conftest forces an 8-device CPU mesh
    params = RenderParams(shader="volpathtrace", samples=2, resolution=36,
                          bounces=3)
    scene = make_test_scene(sphere_steps=6)
    img1, _ = Renderer(scene, params, devices=1).render(samples=2, chunk=2)
    rN = Renderer(scene, params, devices=n)
    assert rN.n_devices == n
    imgN, _ = rN.render(samples=2, chunk=2)
    np.testing.assert_array_equal(img1, imgN)


def test_checkpoint_config_mismatch_raises(tmp_path, renderer):
    from vpt_tpu.render import checkpoint as CK

    ck = str(tmp_path / "state.npz")
    _, st = renderer.render(samples=1, chunk=1, checkpoint=ck)
    other = RenderParams(shader="naive", samples=4, resolution=48, bounces=3)
    with pytest.raises(ValueError, match="different render config"):
        CK.load_checkpoint(ck, other, renderer.width, renderer.height)
