"""BVH traversal validated hit-for-hit against the brute-force intersector
(SURVEY.md §7.5)."""

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.ops.bvh import build_bvh, intersect_bvh
from vpt_tpu.ops.intersect import intersect_tris_brute


def _random_tris(n, seed=0, scale=1.0):
    r = np.random.RandomState(seed)
    base = r.randn(n, 1, 3) * scale
    offs = r.randn(n, 3, 3) * 0.1 * scale
    return (base + offs).astype(np.float32)


def _rays_at(target_lo, target_hi, n, seed=1):
    r = np.random.RandomState(seed)
    o = np.array([3.0, 2.0, 4.0], np.float32) + r.randn(n, 3).astype(np.float32) * 0.2
    t = (target_lo + (target_hi - target_lo) * r.rand(n, 3)).astype(np.float32)
    d = t - o
    d /= np.linalg.norm(d, axis=1, keepdims=True)
    return o, d.astype(np.float32)


def test_bvh_matches_brute_force_random():
    tris = _random_tris(500)
    bvh, perm = build_bvh(tris)
    trisp = tris[perm]
    o, d = _rays_at(tris.min((0, 1)), tris.max((0, 1)), 256)
    bvh_d = jax.tree.map(jnp.asarray, bvh)
    res = intersect_bvh(bvh_d, jnp.asarray(trisp), jnp.asarray(o), jnp.asarray(d))
    ref = intersect_tris_brute(jnp.asarray(o), jnp.asarray(d), jnp.asarray(trisp),
                               1e-4, 1e30)
    assert np.array_equal(np.asarray(res["hit"]), np.asarray(ref["hit"]))
    h = np.asarray(res["hit"])
    assert h.sum() >= 20  # rays actually hit (sparse random scene)
    np.testing.assert_allclose(
        np.asarray(res["dist"])[h], np.asarray(ref["dist"])[h], rtol=1e-5
    )
    # same triangle chosen (modulo exact ties, which argmin resolves equally)
    assert (np.asarray(res["tri"])[h] == np.asarray(ref["tri"])[h]).mean() > 0.99


def test_bvh_respects_tmax_and_tmin():
    tris = _random_tris(100, seed=3)
    bvh, perm = build_bvh(tris)
    trisp = tris[perm]
    o, d = _rays_at(tris.min((0, 1)), tris.max((0, 1)), 128, seed=4)
    bvh_d = jax.tree.map(jnp.asarray, bvh)
    full = intersect_bvh(bvh_d, jnp.asarray(trisp), jnp.asarray(o), jnp.asarray(d))
    h = np.asarray(full["hit"])
    dist = np.asarray(full["dist"])
    # shrink tmax just below each hit: those rays must now miss or hit farther?
    # (closest-hit with smaller tmax must miss)
    tmax = jnp.asarray(np.where(h, dist * 0.99, 1e30).astype(np.float32))
    res2 = intersect_bvh(bvh_d, jnp.asarray(trisp), jnp.asarray(o), jnp.asarray(d),
                         tmax=tmax)
    h2 = np.asarray(res2["hit"])
    d2 = np.asarray(res2["dist"])
    assert np.all(~h2[h] | (d2[h] <= dist[h] * 0.99 + 1e-6))


def test_bvh_quadsphere_dense():
    from vpt_tpu.scene.ply import load_ply

    m = load_ply("/root/reference/tests/03_volume/shapes/sphere.ply")
    q = m["quads"]
    t1 = q[:, [0, 1, 3]]
    t2 = q[:, [2, 3, 1]]
    tris = m["positions"][np.concatenate([t1, t2])]
    bvh, perm = build_bvh(tris)
    trisp = tris[perm]
    lo, hi = tris.min((0, 1)), tris.max((0, 1))
    o, d = _rays_at(lo, hi, 512, seed=7)
    bvh_d = jax.tree.map(jnp.asarray, bvh)
    res = intersect_bvh(bvh_d, jnp.asarray(trisp), jnp.asarray(o), jnp.asarray(d))
    ref = intersect_tris_brute(jnp.asarray(o), jnp.asarray(d), jnp.asarray(trisp),
                               1e-4, 1e30)
    assert np.array_equal(np.asarray(res["hit"]), np.asarray(ref["hit"]))
    h = np.asarray(res["hit"])
    assert h.sum() > 300
    np.testing.assert_allclose(
        np.asarray(res["dist"])[h], np.asarray(ref["dist"])[h], rtol=1e-5
    )


def _sphere_scene_rays():
    from vpt_tpu.scene.ply import load_ply

    m = load_ply("/root/reference/tests/03_volume/shapes/sphere.ply")
    q = m["quads"]
    tris = m["positions"][np.concatenate([q[:, [0, 1, 3]], q[:, [2, 3, 1]]])]
    bvh, perm = build_bvh(tris)
    o, d = _rays_at(tris.min((0, 1)), tris.max((0, 1)), 256, seed=5)
    alive = np.random.RandomState(9).rand(256) > 0.25
    return tris[perm], bvh, o, d, alive


def test_pallas_packet_matches_xla_traversal(monkeypatch):
    """The Pallas packet kernel (interpret mode on CPU) must agree with the
    pure-XLA traversal element-for-element: hits, tri ids, distances, uv."""
    from vpt_tpu.ops.bvh_pallas import from_bvh_arrays, intersect_bvh_pallas

    monkeypatch.setenv("VPT_CPU_TRAVERSE", "xla")
    trisp, bvh, o, d, alive = _sphere_scene_rays()
    bvh_d = jax.tree.map(jnp.asarray, bvh)
    pb = jax.tree.map(jnp.asarray, from_bvh_arrays(bvh))
    # packed-layout pin (review r5): empty (ref == -1) child slots carry
    # zeroed slab floats — leaf (<= -2) and internal (>= 0) slots do not
    # (byte-level consumers of the documented layout rely on this)
    nodes = np.asarray(pb.nodes)
    refs = nodes[:, 48:56].astype(np.int64)  # refs stored as exact f32
    slabs = nodes[:, :48].reshape(-1, 8, 6)
    assert (refs == -1).any()
    assert (slabs[refs == -1] == 0.0).all()
    ref = intersect_bvh(bvh_d, jnp.asarray(trisp), jnp.asarray(o),
                        jnp.asarray(d), alive=jnp.asarray(alive))
    new = intersect_bvh_pallas(pb, jnp.asarray(o), jnp.asarray(d),
                               alive=jnp.asarray(alive), interpret=True)
    assert np.array_equal(np.asarray(ref["hit"]), np.asarray(new["hit"]))
    h = np.asarray(ref["hit"])
    assert h.sum() >= 10
    assert np.array_equal(np.asarray(ref["tri"])[h], np.asarray(new["tri"])[h])
    np.testing.assert_allclose(
        np.asarray(ref["dist"])[h], np.asarray(new["dist"])[h], rtol=1e-6)
    # uv tolerance: the two programs fuse the Moller-Trumbore dot products
    # differently (FMA contraction), and with |o - p0| ~ 5 against ~5e-3
    # edges the last-ulp difference in (o - p0) amplifies to ~1e-4 in uv
    np.testing.assert_allclose(
        np.asarray(ref["uv"])[h], np.asarray(new["uv"])[h], atol=5e-4)


def test_native_cpu_traversal_matches_xla(monkeypatch):
    """The native C++ traversal (the CPU-backend default, ops/bvh.py
    _traverse_native) must agree with the pure-XLA loop: same hits/tris,
    distances to rtol 1e-5, uv to 1e-3 (XLA's LLVM backend contracts
    mul+add into FMA, scalar C++ does not — on sliver triangles near the
    sphere poles the Moller-Trumbore uv amplifies that last-ulp difference,
    so bitwise parity across backends is not achievable there)."""
    from vpt_tpu import native

    if not native.available():
        import pytest

        pytest.skip("native helpers unavailable")
    trisp, bvh, o, d, alive = _sphere_scene_rays()
    bvh_d = jax.tree.map(jnp.asarray, bvh)
    monkeypatch.setenv("VPT_CPU_TRAVERSE", "native")
    nat = intersect_bvh(bvh_d, jnp.asarray(trisp), jnp.asarray(o),
                        jnp.asarray(d), alive=jnp.asarray(alive))
    monkeypatch.setenv("VPT_CPU_TRAVERSE", "xla")
    ref = intersect_bvh(bvh_d, jnp.asarray(trisp), jnp.asarray(o),
                        jnp.asarray(d), alive=jnp.asarray(alive))
    assert np.array_equal(np.asarray(ref["hit"]), np.asarray(nat["hit"]))
    h = np.asarray(ref["hit"])
    assert np.array_equal(np.asarray(ref["tri"])[h], np.asarray(nat["tri"])[h])
    np.testing.assert_allclose(
        np.asarray(ref["dist"])[h], np.asarray(nat["dist"])[h], rtol=1e-5)
    np.testing.assert_allclose(
        np.asarray(ref["uv"])[h], np.asarray(nat["uv"])[h], atol=1e-3)


def test_light_pdf_bvh_matches_exact_sweep_on_mesh_emitter():
    """A ~1k-triangle emissive sphere light must take the bounded all-hits
    BVH walk (bvh_slot assigned) and produce the same solid-angle pdf as the
    exact O(rays x triangles) sweep (yocto_pathtrace.cpp:363-378 parity)."""
    import dataclasses

    from vpt_tpu.render.lights import build_lights_static, sample_lights_pdf
    from vpt_tpu.scene.flatten import LIGHT_BVH_THRESHOLD, flatten_scene
    from vpt_tpu.scene.procedural import make_uvsphere
    from vpt_tpu.scene.schema import (
        Camera, HostScene, Instance, Material, Shape,
    )

    s = HostScene()
    s.cameras.append(Camera(
        frame=np.eye(4, 3, k=0, dtype=np.float32).reshape(4, 3),
        lens=0.05, aspect=1.0, film=0.036, focus=1.0, aperture=0.0))
    s.materials.append(Material(
        type=0, emission=np.array([5.0, 5.0, 5.0], np.float32)))
    sph = make_uvsphere((32, 16), 0.3)
    s.shapes.append(Shape(**sph))
    ident = np.asarray(
        [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0.5, 0], np.float32).reshape(4, 3)
    s.instances.append(Instance(frame=ident, shape=0, material=0))
    sa = flatten_scene(s)
    assert sa.light_tri_count[0] > LIGHT_BVH_THRESHOLD
    lights = build_lights_static(sa)
    assert lights[0].bvh_slot >= 0
    lights_exact = [dataclasses.replace(lights[0], bvh_slot=-1)]
    ds = jax.tree.map(jnp.asarray, sa)

    rng = np.random.RandomState(3)
    pos = rng.uniform(-1, 1, (64, 3)).astype(np.float32)
    pos[:, 1] -= 1.0  # below the sphere
    to_ctr = np.array([0, 0.5, 0], np.float32) - pos
    dirs = to_ctr + rng.normal(0, 0.25, (64, 3)).astype(np.float32)
    dirs /= np.linalg.norm(dirs, axis=-1, keepdims=True)

    p_bvh = np.asarray(sample_lights_pdf(
        ds, lights, jnp.asarray(pos), jnp.asarray(dirs)))
    p_exact = np.asarray(sample_lights_pdf(
        ds, lights_exact, jnp.asarray(pos), jnp.asarray(dirs)))
    assert (p_exact > 0).sum() >= 20  # many rays actually cross the emitter
    np.testing.assert_allclose(p_bvh, p_exact, rtol=2e-5, atol=1e-7)


def test_pallas_nonresident_hbm_mode_matches(monkeypatch):
    """Large-BVH path: tables in HBM with per-pop row DMA must agree with
    the VMEM-resident mode (forced by shrinking the residency budget)."""
    from vpt_tpu.ops import bvh_pallas as BP
    from vpt_tpu.scene.ply import load_ply

    m = load_ply("/root/reference/tests/03_volume/shapes/sphere.ply")
    q = m["quads"]
    tris = m["positions"][np.concatenate([q[:, [0, 1, 3]], q[:, [2, 3, 1]]])]
    bvh, perm = build_bvh(tris)
    pb = jax.tree.map(jnp.asarray, BP.from_bvh_arrays(bvh))
    o, d = _rays_at(tris.min((0, 1)), tris.max((0, 1)), 192, seed=11)
    ref = BP.intersect_bvh_pallas(pb, jnp.asarray(o), jnp.asarray(d),
                                  interpret=True)
    monkeypatch.setattr(BP, "RESIDENT_BYTES", 0)
    new = BP.intersect_bvh_pallas(pb, jnp.asarray(o), jnp.asarray(d),
                                  interpret=True)
    assert np.array_equal(np.asarray(ref["hit"]), np.asarray(new["hit"]))
    h = np.asarray(ref["hit"])
    assert h.sum() >= 10
    assert np.array_equal(np.asarray(ref["tri"])[h], np.asarray(new["tri"])[h])
    np.testing.assert_allclose(
        np.asarray(ref["dist"])[h], np.asarray(new["dist"])[h], rtol=1e-6)


def test_bvh_refit_tracks_moved_geometry():
    """Refit (yocto_bvh.cpp:510-524 semantics): after moving vertices with
    fixed topology, the refitted BVH must agree with brute force on the new
    geometry."""
    from vpt_tpu.ops.bvh import build_bvh_refittable, refit_bvh

    tris = _random_tris(300, seed=12)
    bvh, perm, info = build_bvh_refittable(tris)
    trisp = tris[perm]
    moved = trisp + np.sin(trisp * 3.0) * 0.2  # smooth deformation
    re = refit_bvh(bvh, info, moved.astype(np.float32))
    o, d = _rays_at(moved.min((0, 1)), moved.max((0, 1)), 256, seed=13)
    bvh_d = jax.tree.map(jnp.asarray, re)
    res = intersect_bvh(bvh_d, jnp.asarray(moved), jnp.asarray(o),
                        jnp.asarray(d))
    ref = intersect_tris_brute(jnp.asarray(o), jnp.asarray(d),
                               jnp.asarray(moved), 1e-4, 1e30)
    assert np.array_equal(np.asarray(res["hit"]), np.asarray(ref["hit"]))
    h = np.asarray(res["hit"])
    assert h.sum() >= 20
    np.testing.assert_allclose(
        np.asarray(res["dist"])[h], np.asarray(ref["dist"])[h], rtol=1e-5)


def test_batcher_network_sorts():
    """The generated Batcher odd-even mergesort network (used for node
    widths other than 8; the 8-wide network is the historical hand-written
    sequence) must sort every input, including duplicates."""
    import random

    from vpt_tpu.ops.bvh_pallas import _batcher_pairs

    rng = random.Random(7)
    for n in (4, 8, 16):
        net = _batcher_pairs(n)
        for _ in range(500):
            a = [rng.randint(0, 9) for _ in range(n)]
            b = a[:]
            for i, j in net:
                if b[i] > b[j]:
                    b[i], b[j] = b[j], b[i]
            assert b == sorted(a)
