"""Native C++ helpers must agree exactly with the pure-Python references."""

import os

import numpy as np
import pytest

from vpt_tpu import native


def _python_bvh(tris, leaf_size):
    os.environ["VPT_NATIVE"] = "0"
    try:
        import vpt_tpu.ops.bvh as B

        return B.build_bvh(tris, leaf_size=leaf_size)
    finally:
        os.environ["VPT_NATIVE"] = "1"


needs_native = pytest.mark.skipif(not native.available(),
                                  reason="no native toolchain")


@needs_native
@pytest.mark.parametrize("leaf_size", [4, 8])
def test_bvh_build_native_bit_identical(leaf_size):
    r = np.random.RandomState(3)
    tris = (r.randn(777, 1, 3) + r.randn(777, 3, 3) * 0.1).astype(np.float32)
    built = native.bvh_build4(tris, leaf_size)
    assert built is not None
    node_n, leaf_n, root_n, perm_n = built
    bvh_p, perm_p = _python_bvh(tris, leaf_size)
    assert np.array_equal(perm_n, perm_p)
    assert int(root_n) == int(bvh_p.root)
    assert node_n.shape == bvh_p.node_rec.shape
    assert leaf_n.shape == bvh_p.leaf_rec.shape
    assert np.array_equal(node_n.view(np.uint32), bvh_p.node_rec.view(np.uint32))
    assert np.array_equal(leaf_n.view(np.uint32), bvh_p.leaf_rec.view(np.uint32))


@needs_native
@pytest.mark.parametrize("leaf_size", [4, 8])
def test_bvh_build_native_small_and_leafroot(leaf_size):
    for T in (1, 3, 4, 5, 17):
        r = np.random.RandomState(T)
        tris = r.randn(T, 3, 3).astype(np.float32)
        node_n, leaf_n, root_n, perm_n = native.bvh_build4(tris, leaf_size)
        bvh_p, perm_p = _python_bvh(tris, leaf_size)
        assert np.array_equal(perm_n, perm_p), T
        assert int(root_n) == int(bvh_p.root), T
        assert np.array_equal(node_n.view(np.uint32),
                              bvh_p.node_rec.view(np.uint32)), T
        assert np.array_equal(leaf_n.view(np.uint32),
                              bvh_p.leaf_rec.view(np.uint32)), T


@needs_native
def test_png_unfilter_native_matches_python_roundtrip():
    from vpt_tpu.scene import image_io

    r = np.random.RandomState(0)
    img = r.randint(0, 256, (37, 53, 4), dtype=np.uint8)
    data = image_io.encode_png(img)
    # native path (default)
    dec_native = image_io.decode_png(data)
    # force python path (the env toggle is checked per call)
    os.environ["VPT_NATIVE"] = "0"
    try:
        dec_py = image_io.decode_png(data)
    finally:
        os.environ["VPT_NATIVE"] = "1"
    assert np.array_equal(dec_native, dec_py)
    assert np.array_equal(dec_native, img)
