"""Experiment: does sorting rays by (origin-Morton, direction-octant) cut the
Pallas packet-traversal cost for incoherent bounce rays?

Round-3 PERF.md measured 46 ms for 54k incoherent rays (vs 12.4 coherent):
each 2048-ray packet pays the union of its rays' node visits. Sorting
clusters rays that visit the same subtrees. The round-3 write-off of sorting
("argsort costs 12 ms") was wrong — argsort on 54k keys measures ~1 ms.
"""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np

from vpt_tpu.renderer import Renderer, RenderParams
from vpt_tpu.runtime import enable_compile_cache

SCENE = "/root/reference/tests/03_volume/volume.json"


def timeit(fn, *args, iters=16):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


def morton3(q, bits):
    """Interleave 3x `bits`-bit ints -> 3*bits-bit Morton code."""
    def spread(v):
        out = jnp.zeros_like(v)
        for b in range(bits):
            out = out | (((v >> b) & 1) << (3 * b))
        return out
    return spread(q[..., 0]) | (spread(q[..., 1]) << 1) | (spread(q[..., 2]) << 2)


def main():
    enable_compile_cache()
    params = RenderParams(shader="volpathtrace", samples=64, resolution=360,
                          bounces=8)
    r = Renderer(SCENE, params)
    ds = r.ds
    R = r.width * r.height
    from vpt_tpu.render import state as RS
    pixel_ids = jnp.arange(R, dtype=jnp.uint32)
    o, d = jax.jit(lambda: RS.camera_rays(
        ds, 0, r.width, r.height, pixel_ids, jnp.int32(0), 64, 1301081))()

    from vpt_tpu.ops.bvh import intersect_scene
    f_isect = jax.jit(lambda o, d: intersect_scene(ds, o, d))
    isect = f_isect(o, d)
    # incoherent set: origins at hit points, shuffled directions
    key = jax.random.PRNGKey(0)
    hitp = o + d * jnp.minimum(isect["dist"], 10.0)[:, None]
    dshuf = jax.random.normal(key, (R, 3))
    dshuf = dshuf / jnp.linalg.norm(dshuf, axis=-1, keepdims=True)
    # ALSO randomly permute ray order (in the real integrator rays stay in
    # pixel order, so origins retain image-space coherence; test both)
    perm = jax.random.permutation(jax.random.PRNGKey(1), R)
    hitp_p, dshuf_p = hitp[perm], dshuf[perm]

    bb_lo = jnp.asarray(np.asarray(r.arrays.tri_pos).reshape(-1, 3).min(0))
    bb_hi = jnp.asarray(np.asarray(r.arrays.tri_pos).reshape(-1, 3).max(0))

    def sort_key(o_, d_, mbits, oct_low):
        q = jnp.clip(((o_ - bb_lo) / (bb_hi - bb_lo) * (1 << mbits))
                     .astype(jnp.int32), 0, (1 << mbits) - 1)
        m = morton3(q, mbits)
        octant = ((d_[:, 0] < 0).astype(jnp.int32)
                  | ((d_[:, 1] < 0).astype(jnp.int32) << 1)
                  | ((d_[:, 2] < 0).astype(jnp.int32) << 2))
        if oct_low:
            return (m << 3) | octant
        return (octant << (3 * mbits)) | m

    def traverse(o_, d_):
        return intersect_scene(ds, o_, d_)["dist"]

    def traverse_sorted(o_, d_, mbits=4, oct_low=True):
        k = sort_key(o_, d_, mbits, oct_low)
        order = jnp.argsort(k)
        dist = intersect_scene(ds, o_[order], d_[order])["dist"]
        inv = jnp.zeros((R,), jnp.int32).at[order].set(
            jnp.arange(R, dtype=jnp.int32))
        return dist[inv]

    t0 = timeit(jax.jit(traverse), hitp, dshuf)
    print(f"incoherent unsorted (pixel-order origins): {t0*1e3:7.2f} ms")
    t0p = timeit(jax.jit(traverse), hitp_p, dshuf_p)
    print(f"incoherent unsorted (shuffled order):      {t0p*1e3:7.2f} ms")
    for mbits in (3, 4, 5):
        for oct_low in (True, False):
            f = jax.jit(lambda o_, d_, m=mbits, ol=oct_low:
                        traverse_sorted(o_, d_, m, ol))
            t1 = timeit(f, hitp, dshuf)
            t1p = timeit(f, hitp_p, dshuf_p)
            print(f"sorted mbits={mbits} oct_low={int(oct_low)}: "
                  f"pixel-order {t1*1e3:7.2f} ms, shuffled {t1p*1e3:7.2f} ms")

    # half-dead ray set (like late bounces): does alive-compaction help?
    alive = jax.random.uniform(jax.random.PRNGKey(2), (R,)) < 0.25
    f_a = jax.jit(lambda o_, d_, a: intersect_scene(ds, o_, d_, alive=a)["dist"])
    ta = timeit(f_a, hitp, dshuf, alive)
    print(f"25%-alive unsorted:  {ta*1e3:7.2f} ms")

    def traverse_sorted_alive(o_, d_, a, mbits=4):
        k = sort_key(o_, d_, mbits, True) | jnp.where(a, 0, 1 << 30)
        order = jnp.argsort(k)
        dist = intersect_scene(ds, o_[order], d_[order], alive=a[order])["dist"]
        inv = jnp.zeros((R,), jnp.int32).at[order].set(
            jnp.arange(R, dtype=jnp.int32))
        return dist[inv]
    ta2 = timeit(jax.jit(traverse_sorted_alive), hitp, dshuf, alive)
    print(f"25%-alive sorted:    {ta2*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
