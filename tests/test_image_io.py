"""Image codec tests: EXR roundtrips (reference: tinyexr via
yocto_sceneio.cpp:411-560) plus PNG/HDR sanity cross-checks."""

import numpy as np
import pytest

from vpt_tpu.scene import exr, image_io


def _rand_img(h, w, c, seed=0):
    r = np.random.default_rng(seed)
    img = r.uniform(0.0, 4.0, size=(h, w, c)).astype(np.float32)
    img[0, 0, 0] = 0.0
    return img


@pytest.mark.parametrize("comp", [exr.COMP_NONE, exr.COMP_ZIPS, exr.COMP_ZIP])
def test_exr_roundtrip_float(comp):
    img = _rand_img(21, 17, 4, seed=comp)
    data = exr.encode_exr(img, half=False, compression=comp)
    out, names = exr.decode_exr(data)
    assert names == ["A", "B", "G", "R"]
    np.testing.assert_array_equal(out, img)


def test_exr_roundtrip_half_rgb():
    img = _rand_img(33, 9, 3, seed=7)
    data = exr.encode_exr(img, half=True)
    out, names = exr.decode_exr(data)
    assert names == ["B", "G", "R"]
    np.testing.assert_allclose(out[..., :3], img, rtol=1e-3, atol=1e-3)
    np.testing.assert_array_equal(out[..., 3], 1.0)  # alpha filled


def test_exr_zip_blocks_nonmultiple_height():
    # 35 rows -> three 16-line ZIP blocks, last partial
    img = _rand_img(35, 8, 3, seed=3)
    out, _ = exr.decode_exr(exr.encode_exr(img, half=False))
    np.testing.assert_array_equal(out[..., :3], img)


def test_exr_load_image_dispatch(tmp_path):
    img = _rand_img(6, 5, 4, seed=1)
    p = str(tmp_path / "t.exr")
    exr.save_exr(p, img, half=False)
    pix, linear = image_io.load_image(p)
    assert linear is True
    assert pix.shape == (6, 5, 4)
    np.testing.assert_array_equal(pix, img)


def test_exr_zip_predictor_roundtrip():
    r = np.random.default_rng(11)
    raw = r.integers(0, 256, size=1001, dtype=np.uint8)
    enc = exr._zip_preprocess(raw)
    dec = exr._zip_postprocess(enc)
    np.testing.assert_array_equal(dec, raw)


def test_save_render_exr(tmp_path):
    from vpt_tpu.renderer import save_render

    img = _rand_img(4, 4, 4, seed=2)
    p = str(tmp_path / "o.exr")
    save_render(p, img)
    pix, linear = image_io.load_image(p)
    assert linear
    # save_render writes half floats: ~1e-3 relative precision
    np.testing.assert_allclose(pix, img, rtol=2e-3, atol=2e-3)
