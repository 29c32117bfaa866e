"""4-wide BVH: host-side numpy builder + lock-step short-stack traversal.

Design (TPU-first, not a port of yocto_bvh.cpp): instance transforms are baked
into a single world-space triangle soup at flatten time, so one single-level
BVH replaces the reference's two-level TLAS+BLAS
(/root/reference/libs/yocto/yocto_bvh.cpp:574-673) — no per-instance ray
transforms in the hot loop.

The tree is 4-ary: one (N, 32) node row holds all four children's slabs plus
child refs, so each traversal step costs ONE gather and tests four boxes.
Children are pushed far-to-near (5-exchange sort network) onto a per-ray
short stack carried in the while_loop state, giving ordered descent and fast
tmax shrink. All arithmetic runs on (R,)-shaped component vectors (SoA after
a single per-gather transpose) — minor-dim-3/4 layouts waste the 128-lane
VPU (measured 2-4x slower).

Child ref encoding: >= 0 internal node index; <= -2 leaf id -(ref+2); -1
empty slot. Leaves pack LEAF_SIZE triangles into one flat (L, LEAF_SIZE*10)
row (9 coords each + ids as bit-cast floats); padding triangles are
degenerate (det == 0 rejected, matching yocto intersect_triangle,
yocto_geometry.h:798).

Differentiation: traversal is wrapped in a zero-gradient custom_vjp —
visibility is a step function; path gradients flow through materials/volume
coefficients, not hit geometry (SURVEY.md §7.9, BASELINE.json).
"""

from __future__ import annotations

import sys
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vecmath import FLT_MAX, RAY_EPS

LEAF_SIZE = 8
STACK_DEPTH = 32


class BvhArrays(NamedTuple):
    node_rec: jnp.ndarray  # (N, 32): 4x(min3,max3) + 4 child refs (bits) + pad
    leaf_rec: jnp.ndarray  # (L, LEAF_SIZE*10)
    root: jnp.ndarray      # () int32 root ref (may itself be a leaf ref)


def build_bvh(tri_pos: np.ndarray, leaf_size: int = LEAF_SIZE):
    """tri_pos: (T, 3, 3) world-space triangles. Returns (BvhArrays numpy,
    perm); apply perm to all per-triangle arrays.

    Uses the native C++ builder (vpt_tpu/native) when available — emits
    bit-identical records (tests/test_native.py) ~100x faster; this Python
    implementation is the reference/fallback."""
    T = tri_pos.shape[0]
    LS = leaf_size
    if T > 0:
        from .. import native

        built = native.bvh_build4(np.asarray(tri_pos, np.float32), LS)
        if built is not None:
            node_rec, leaf_rec, root, perm = built
            return (
                BvhArrays(node_rec=node_rec, leaf_rec=leaf_rec, root=root),
                perm,
            )
    if T == 0:
        leaf = np.zeros((1, LS * 10), np.float32)
        leaf[:, LS * 9:] = np.full(LS, -1, np.int32).view(np.float32)
        return (
            BvhArrays(
                node_rec=np.zeros((1, 32), np.float32),
                leaf_rec=leaf,
                root=np.int32(-2),
            ),
            np.zeros(0, np.int64),
        )
    bb_min = tri_pos.min(axis=1)
    bb_max = tri_pos.max(axis=1)
    centers = (bb_min + bb_max) * 0.5
    perm = np.arange(T)

    sys.setrecursionlimit(100000)
    nodes = []      # (refs[4], ranges[4])
    leaf_meta = []  # (start, count)

    def split2(start, end):
        ids = perm[start:end]
        c = centers[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        perm[start:end] = ids[order]
        return start + (end - start) // 2

    def emit(start, end, depth):
        count = end - start
        if count <= LS or depth > 40:
            leaf_meta.append((start, min(count, LS)))
            return -(len(leaf_meta) - 1) - 2
        if count <= 4 * LS:
            # pack FULL leaves: one sort along the widest axis, then chunk
            # into ceil(count/LS) consecutive leaves under one node. The
            # naive 4-way median split would stop at ~count/4 triangles per
            # leaf (whole levels of 1/4-full leaves).
            split2(start, end)
            my = len(nodes)
            nodes.append(None)
            ranges = [(min(start + k * LS, end), min(start + (k + 1) * LS, end))
                      for k in range(4)]
            refs = []
            for s, e in ranges:
                if e > s:
                    leaf_meta.append((s, e - s))
                    refs.append(-(len(leaf_meta) - 1) - 2)
                else:
                    refs.append(-1)
            nodes[my] = (refs, ranges)
            return my
        mid = split2(start, end)
        q1 = split2(start, mid)
        q3 = split2(mid, end)
        my = len(nodes)
        nodes.append(None)
        ranges = [(start, q1), (q1, mid), (mid, q3), (q3, end)]
        refs = [emit(s, e, depth + 1) if e > s else -1 for s, e in ranges]
        nodes[my] = (refs, ranges)
        return my

    root = emit(0, T, 0)
    tri_posp = tri_pos[perm]
    pre_min = np.minimum.reduce(tri_posp, axis=1)
    pre_max = np.maximum.reduce(tri_posp, axis=1)
    N = max(len(nodes), 1)
    node_rec = np.zeros((N, 32), np.float32)
    for i, entry in enumerate(nodes):
        refs, ranges = entry
        for k, ((s, e), ref) in enumerate(zip(ranges, refs)):
            if e > s:
                lo = pre_min[s:e].min(axis=0)
                hi = pre_max[s:e].max(axis=0)
            else:
                lo = np.full(3, 1e30, np.float32)
                hi = np.full(3, -1e30, np.float32)
            node_rec[i, k * 6:k * 6 + 3] = lo
            node_rec[i, k * 6 + 3:k * 6 + 6] = hi
        node_rec[i, 24:28] = np.asarray(refs, np.int32).view(np.float32)

    L = max(len(leaf_meta), 1)
    leaf_rec = np.zeros((L, LS * 10), np.float32)
    leaf_rec[:, LS * 9:] = np.full(LS, -1, np.int32).view(np.float32)
    for li, (start, count) in enumerate(leaf_meta):
        tris = np.zeros((LS, 9), np.float32)
        tris[:count] = tri_posp[start:start + count].reshape(count, 9)
        leaf_rec[li, :LS * 9] = tris.reshape(-1)
        ids = np.full(LS, -1, np.int32)
        ids[:count] = np.arange(start, start + count, dtype=np.int32)
        leaf_rec[li, LS * 9:] = ids.view(np.float32)

    return (
        BvhArrays(
            node_rec=node_rec,
            leaf_rec=leaf_rec,
            root=np.int32(root),
        ),
        perm,
    )


class BvhRefitInfo(NamedTuple):
    """Topology retained for refitting (yocto_bvh.cpp:510-524): child refs
    per node (leaf/internal encoding as in node_rec) and leaf prim spans
    into the permuted triangle order."""
    child_refs: np.ndarray   # (N, 4) int32
    leaf_meta: np.ndarray    # (L, 2) int32 (start, count)
    perm: np.ndarray         # (T,) permutation applied at build


def build_bvh_refittable(tri_pos: np.ndarray):
    """Python build that also returns the refit topology. Returns
    (BvhArrays, perm, BvhRefitInfo)."""
    # force the Python builder: the native one does not expose leaf spans
    import vpt_tpu.native as native_mod

    orig = native_mod.bvh_build4
    native_mod.bvh_build4 = lambda *_a, **_k: None
    try:
        bvh, perm = build_bvh(tri_pos)
    finally:
        native_mod.bvh_build4 = orig
    N = bvh.node_rec.shape[0]
    child_refs = bvh.node_rec[:, 24:28].view(np.int32).copy()
    L = bvh.leaf_rec.shape[0]
    LS = bvh.leaf_rec.shape[1] // 10
    ids = bvh.leaf_rec[:, LS * 9:].view(np.int32)
    starts = np.where((ids >= 0).any(axis=1), ids[:, 0], 0)
    counts = (ids >= 0).sum(axis=1)
    info = BvhRefitInfo(
        child_refs=child_refs,
        leaf_meta=np.stack([starts, counts.astype(np.int32)], axis=1),
        perm=perm)
    return bvh, perm, info


def refit_bvh(bvh: BvhArrays, info: BvhRefitInfo,
              tri_pos_permuted: np.ndarray) -> BvhArrays:
    """Update leaf geometry and node bounds for moved vertices with fixed
    topology (yocto refit_bvh semantics). tri_pos_permuted: (T, 3, 3) in
    the build permutation order."""
    LS = bvh.leaf_rec.shape[1] // 10
    L = bvh.leaf_rec.shape[0]
    leaf_rec = np.asarray(bvh.leaf_rec).copy()
    leaf_lo = np.full((L, 3), 1e30, np.float32)
    leaf_hi = np.full((L, 3), -1e30, np.float32)
    pre_min = tri_pos_permuted.min(axis=1)
    pre_max = tri_pos_permuted.max(axis=1)
    for li in range(L):
        s, c = info.leaf_meta[li]
        if c == 0:
            continue
        tris = np.zeros((LS, 9), np.float32)
        tris[:c] = tri_pos_permuted[s:s + c].reshape(c, 9)
        leaf_rec[li, :LS * 9] = tris.reshape(-1)
        leaf_lo[li] = pre_min[s:s + c].min(axis=0)
        leaf_hi[li] = pre_max[s:s + c].max(axis=0)

    N = bvh.node_rec.shape[0]
    node_rec = np.asarray(bvh.node_rec).copy()
    node_lo = np.full((N, 3), 1e30, np.float32)
    node_hi = np.full((N, 3), -1e30, np.float32)
    # children are allocated after their parent, so a reverse sweep sees
    # every child's bounds before its parent needs them
    for ni in range(N - 1, -1, -1):
        for k in range(4):
            ref = info.child_refs[ni, k]
            if ref == -1:
                lo = np.full(3, 1e30, np.float32)
                hi = np.full(3, -1e30, np.float32)
            elif ref >= 0:
                lo, hi = node_lo[ref], node_hi[ref]
            else:
                lo, hi = leaf_lo[-ref - 2], leaf_hi[-ref - 2]
            node_rec[ni, k * 6:k * 6 + 3] = lo
            node_rec[ni, k * 6 + 3:k * 6 + 6] = hi
            node_lo[ni] = np.minimum(node_lo[ni], lo)
            node_hi[ni] = np.maximum(node_hi[ni], hi)
    return BvhArrays(node_rec=node_rec, leaf_rec=leaf_rec, root=bvh.root)


# ---------------------------------------------------------------------------
# device traversal
# ---------------------------------------------------------------------------

def _backend_default():
    """Pallas packet kernel on TPU; XLA while-loop elsewhere (the kernel is
    correct everywhere but interpret mode is too slow for CPU test runs)."""
    import os

    choice = os.environ.get("VPT_BVH", "auto")
    if choice in ("pallas", "xla"):
        return choice
    try:
        return "pallas" if jax.default_backend() == "tpu" else "xla"
    except Exception:
        return "xla"


_BACKEND = None


def traversal_backend() -> str:
    global _BACKEND
    if _BACKEND is None:
        _BACKEND = _backend_default()
    return _BACKEND


def set_traversal_backend(name: str | None):
    """Force 'pallas' / 'xla'; None re-detects from the JAX backend."""
    global _BACKEND
    assert name in (None, "pallas", "xla")
    _BACKEND = name


KIND_TRI, KIND_LINE, KIND_POINT = 0, 1, 2

_MORTON_BITS = 5


def _ray_sort_key(bb, ray_o, ray_d, alive):
    """Traversal-coherence key: origin Morton cell (high bits) + direction
    octant (low bits); dead rays sort to the back so whole packet blocks go
    dead and exit immediately. Round-4: the round-3 write-off of sorting
    ("argsort costs 12 ms/54k keys", PERF.md r3 §3) was wrong — measured
    ~1 ms; sorting + packed permute wins ~25% on incoherent packets and
    ~30% on partially-dead ones (tools/exp_sort.py)."""
    ext = jnp.maximum(bb[1] - bb[0], 1e-20)
    n = 1 << _MORTON_BITS
    q = jnp.clip(((ray_o - bb[0]) / ext * n).astype(jnp.int32), 0, n - 1)

    def spread(v):
        out = jnp.zeros_like(v)
        for b in range(_MORTON_BITS):
            out = out | (((v >> b) & 1) << (3 * b))
        return out

    m = spread(q[..., 0]) | (spread(q[..., 1]) << 1) | (spread(q[..., 2]) << 2)
    octant = ((ray_d[..., 0] < 0).astype(jnp.int32)
              | ((ray_d[..., 1] < 0).astype(jnp.int32) << 1)
              | ((ray_d[..., 2] < 0).astype(jnp.int32) << 2))
    key = (m << 3) | octant
    if alive is not None:
        key = jnp.where(alive, key, jnp.int32(1) << 30)
    return key


def _intersect_pallas_sorted(ds, ray_o, ray_d, tmax, tmin, alive, ls):
    from .bvh_pallas import NEG_INF, intersect_bvh_pallas

    R = ray_o.shape[0]
    # traversal is gradient-free by design (zero-vjp custom rule); cutting
    # the tape here keeps XLA from emitting dead scatter-adds for the
    # permutes' backward
    ray_o = jax.lax.stop_gradient(ray_o)
    ray_d = jax.lax.stop_gradient(ray_d)
    cap = jnp.full((R,), FLT_MAX, jnp.float32) if tmax is None else (
        jax.lax.stop_gradient(jnp.minimum(tmax, FLT_MAX)))
    if alive is not None:
        cap = jnp.where(alive, cap, NEG_INF)
    key = _ray_sort_key(ds.scene_bb, ray_o, ray_d, alive)
    order = jnp.argsort(key)
    iota = jnp.arange(R, dtype=jnp.int32)
    inv = jnp.zeros((R,), jnp.int32).at[order].set(iota)
    # one packed permute in, one packed un-permute out (a 54k-row gather
    # costs ~1 ms regardless of row width — PERF.md)
    packed = jnp.concatenate([ray_o, ray_d, cap[:, None]], axis=1)
    ps = jnp.take(packed, order, axis=0)
    isect = intersect_bvh_pallas(
        ds.bvh_packed, ps[:, 0:3], ps[:, 3:6], tmax=ps[:, 6], tmin=tmin,
        ls=ls)
    # NOTE: tri must be un-permuted as int32 — a bitcast through f32 would
    # let the TPU flush denormal bit patterns (small triangle ids) to zero
    # and canonicalize 0xFFFFFFFF (-1) as a NaN
    out_pack = jnp.concatenate(
        [isect["dist"][:, None], isect["uv"]], axis=1)
    ou = jnp.take(out_pack, inv, axis=0)
    tri = jnp.take(isect["tri"], inv, axis=0)
    hit = tri >= 0
    return {
        "hit": hit,
        "dist": jnp.where(hit, ou[:, 0], FLT_MAX),
        "tri": tri,
        "uv": ou[:, 1:3],
    }


def intersect_scene(ds, ray_o, ray_d, tmax=None, tmin=RAY_EPS, alive=None,
                    sort_rays=False):
    """Closest-hit against the scene: triangle BVH (Pallas packet kernel on
    TPU, XLA traversal elsewhere), then line/point primitives brute-force
    (statically skipped when the scene has none — all reference test
    scenes). Returns dict(hit, dist, tri, uv[, kind, prim]).

    sort_rays: permute rays into (origin-Morton, direction-octant) order
    before the packet kernel and un-permute the results — integrators set
    this for bounce rays (incoherent); camera rays are already coherent."""
    if traversal_backend() == "pallas":
        from .bvh_pallas import intersect_bvh_pallas

        ls = int(ds.bvh.leaf_rec.shape[1]) // 10
        if (sort_rays and getattr(ds, "scene_bb", None) is not None
                and int(ray_o.shape[0]) >= 4096):
            isect = _intersect_pallas_sorted(
                ds, ray_o, ray_d, tmax, tmin, alive, ls)
        else:
            isect = intersect_bvh_pallas(
                ds.bvh_packed, ray_o, ray_d, tmax=tmax, tmin=tmin,
                alive=alive, ls=ls)
    else:
        isect = intersect_bvh(ds.bvh, ds.tri_pos, ray_o, ray_d, tmax=tmax,
                              tmin=tmin, alive=alive)
    n_lines = int(ds.line_p.shape[0]) if hasattr(ds, "line_p") else 0
    n_points = int(ds.point_p.shape[0]) if hasattr(ds, "point_p") else 0
    if n_lines == 0 and n_points == 0:
        return isect
    from .intersect import intersect_lines_brute, intersect_points_brute

    R = ray_o.shape[0]
    live = jnp.ones((R,), bool) if alive is None else alive
    cap = jnp.full((R,), FLT_MAX) if tmax is None else tmax
    cap = jnp.where(live, jnp.minimum(isect["dist"], cap), -FLT_MAX)
    kind = jnp.zeros((R,), jnp.int32)
    prim = jnp.full((R,), -1, jnp.int32)
    out = dict(isect)
    if n_lines:
        lh = intersect_lines_brute(
            ray_o, ray_d, ds.line_p[:, 0], ds.line_p[:, 1],
            ds.line_r[:, 0], ds.line_r[:, 1], tmin, cap)
        take = lh["hit"] & (lh["dist"] < cap)
        cap = jnp.where(take, lh["dist"], cap)
        kind = jnp.where(take, KIND_LINE, kind)
        prim = jnp.where(take, lh["prim"], prim)
        out["uv"] = jnp.where(take[..., None], lh["uv"], out["uv"])
        out["dist"] = jnp.where(take, lh["dist"], out["dist"])
        out["hit"] = out["hit"] | take
    if n_points:
        ph = intersect_points_brute(
            ray_o, ray_d, ds.point_p, ds.point_r, tmin, cap)
        take = ph["hit"] & (ph["dist"] < cap)
        kind = jnp.where(take, KIND_POINT, kind)
        prim = jnp.where(take, ph["prim"], prim)
        out["uv"] = jnp.where(take[..., None], 0.0, out["uv"])
        out["dist"] = jnp.where(take, ph["dist"], out["dist"])
        out["hit"] = out["hit"] | take
    out["kind"] = kind
    out["prim"] = prim
    out["tri"] = jnp.where((kind == KIND_TRI) | ~out["hit"], out["tri"], 0)
    return out


def intersect_bvh(bvh: BvhArrays, tri_pos, ray_o, ray_d, tmax=None,
                  tmin=RAY_EPS, alive=None):
    """Closest-hit over batched rays. ray_o, ray_d: (R, 3); alive: optional
    mask — dead rays cost nothing. Returns dict(hit, dist, tri, uv); tri
    indexes the permuted triangle arrays. tri_pos unused (leaf rows carry
    geometry; kept for API stability)."""
    R = ray_o.shape[0]
    if tmax is None:
        tmax = jnp.full((R,), FLT_MAX, jnp.float32)
    alive_mask = jnp.ones((R,), bool) if alive is None else alive
    best_t, best_tri, best_u, best_v = _traverse(
        bvh.node_rec, bvh.leaf_rec, bvh.root, ray_o, ray_d,
        jnp.minimum(tmax, FLT_MAX), alive_mask, float(tmin))
    hit = best_tri >= 0
    return {
        "hit": hit,
        "dist": jnp.where(hit, best_t, FLT_MAX),
        "tri": best_tri,
        "uv": jnp.stack([best_u, best_v], axis=-1),
    }


def light_pdf_bvh(bvh: BvhArrays, ray_o, ray_d, tmin=RAY_EPS):
    """Solid-angle pdf accumulation over ALL triangles hit along each ray:
    sum of t^2 / |cos|, the bounded replacement for the reference's <=100
    re-cast occluder walk in sample_lights_pdf (yocto_pathtrace.cpp:363-378).
    The BVH covers one light's triangles; every leaf hit contributes (a ray
    crosses each light triangle at most once), so one all-hits traversal
    finds the identical hit set. Divide by the light's total area outside.

    ray_d must be normalized. Returns (R,) sums (no gradient — light
    geometry is not a differentiable parameter class)."""
    pdf = _accumulate_pdf_impl(
        bvh.node_rec, bvh.leaf_rec, bvh.root, ray_o, ray_d, float(tmin))
    return jax.lax.stop_gradient(pdf)


def _accumulate_pdf_impl(node_rec, leaf_rec, root, ray_o, ray_d, tmin):
    if _cpu_native_traversal():
        R = ray_o.shape[0]

        def cb(node_rec, leaf_rec, root, o, d):
            from .. import native

            out = native.bvh_pdf_accum(node_rec, leaf_rec, int(root), o, d,
                                       float(tmin))
            if out is None:
                raise RuntimeError("native pdf walk unavailable at runtime")
            return out

        return jax.pure_callback(
            cb, jax.ShapeDtypeStruct((R,), jnp.float32),
            node_rec, leaf_rec, root, ray_o, ray_d)
    return _accumulate_pdf_xla(node_rec, leaf_rec, root, ray_o, ray_d, tmin)


def _accumulate_pdf_xla(node_rec, leaf_rec, root, ray_o, ray_d, tmin):
    R = ray_o.shape[0]
    LS = leaf_rec.shape[1] // 10
    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    sd = lambda x: jnp.where(jnp.abs(x) < 1e-12,
                             jnp.where(x >= 0, 1e-12, -1e-12), x)
    ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)

    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    stack = stack.at[:, 0].set(root)
    sp = jnp.ones((R,), jnp.int32)
    pos_iota = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]

    def body(state):
        stack, sp, pdf = state
        active = sp > 0
        spm = jnp.maximum(sp - 1, 0)
        ref = jnp.take_along_axis(stack, spm[:, None], axis=1)[:, 0]
        ref = jnp.where(active, ref, -1)
        sp = jnp.where(active, spm, sp)
        is_int = ref >= 0
        is_leaf = ref <= -2

        nrec = node_rec[jnp.where(is_int, ref, 0)]
        nt = nrec.T
        crefs = jax.lax.bitcast_convert_type(nrec[:, 24:28], jnp.int32)
        for k in range(4):
            b = k * 6
            t0x = (nt[b + 0] - ox) * ix
            t1x = (nt[b + 3] - ox) * ix
            t0y = (nt[b + 1] - oy) * iy
            t1y = (nt[b + 4] - oy) * iy
            t0z = (nt[b + 2] - oz) * iz
            t1z = (nt[b + 5] - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin))
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.maximum(t0z, t1z)) * 1.00000024
            hit_k = is_int & (crefs[:, k] != -1) & (tnear <= tfar)
            mask = hit_k[:, None] & (pos_iota == sp[:, None])
            stack = jnp.where(mask, crefs[:, k][:, None], stack)
            sp = sp + hit_k.astype(jnp.int32)

        lid = jnp.where(is_leaf, -ref - 2, 0)
        lrec = leaf_rec[lid]
        lt = lrec.T
        ids = jax.lax.bitcast_convert_type(lrec[:, LS * 9:], jnp.int32)
        for k in range(LS):
            b = k * 9
            p0x, p0y, p0z = lt[b], lt[b + 1], lt[b + 2]
            e1x = lt[b + 3] - p0x
            e1y = lt[b + 4] - p0y
            e1z = lt[b + 5] - p0z
            e2x = lt[b + 6] - p0x
            e2y = lt[b + 7] - p0y
            e2z = lt[b + 8] - p0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = 1.0 / jnp.where(det != 0, det, 1.0)
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
            hit_k = (
                is_leaf & (det != 0) & (u >= 0) & (u <= 1) & (v >= 0)
                & (u + v <= 1) & (tt >= tmin) & (ids[:, k] >= 0))
            # |cos| between the (normalized) ray and the triangle plane:
            # det = dot(d, e1 x e2) = dot(d, gn_unnorm); |gn| = 2*tri_area
            gnx = e1y * e2z - e1z * e2y
            gny = e1z * e2x - e1x * e2z
            gnz = e1x * e2y - e1y * e2x
            gnl = jnp.sqrt(jnp.maximum(
                gnx * gnx + gny * gny + gnz * gnz, 1e-30))
            cosw = jnp.abs(det) / gnl
            contrib = jnp.where(
                hit_k & (cosw > 1e-12),
                tt * tt / jnp.maximum(cosw, 1e-12), 0.0)
            pdf = pdf + contrib

        return stack, sp, pdf

    def cond(state):
        return jnp.any(state[1] > 0)

    init = (stack, sp, jnp.zeros((R,), jnp.float32))
    _, _, pdf = jax.lax.while_loop(cond, body, init)
    return pdf


@partial(jax.custom_vjp, nondiff_argnums=(7,))
def _traverse(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive, tmin):
    return _traverse_impl(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive,
                          tmin)


def _traverse_fwd(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive, tmin):
    out = _traverse_impl(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive,
                         tmin)
    return out, (node_rec.shape, leaf_rec.shape, ray_o.shape, tmax.shape,
                 alive.shape)


def _traverse_bwd(tmin, res, g):
    node_shape, leaf_shape, ray_shape, tmax_shape, alive_shape = res
    return (
        jnp.zeros(node_shape, jnp.float32),
        jnp.zeros(leaf_shape, jnp.float32),
        jnp.zeros((), jnp.int32),
        jnp.zeros(ray_shape, jnp.float32),
        jnp.zeros(ray_shape, jnp.float32),
        jnp.zeros(tmax_shape, jnp.float32),
        jnp.zeros(alive_shape, bool),
    )


_traverse.defvjp(_traverse_fwd, _traverse_bwd)


def _cpu_native_traversal() -> bool:
    """True when the XLA fallback should call the native C++ traversal via
    pure_callback: CPU backend only (the lock-step XLA while-loop was
    measured at ~8 rays/s on real scenes — VERDICT round 2 weak #2; the
    native walk runs at tens of Mray/s on this 2-core host). VPT_CPU_TRAVERSE
    =xla forces the pure-XLA loop (used by tests to compare both)."""
    import os

    if os.environ.get("VPT_CPU_TRAVERSE", "native") != "native":
        return False
    try:
        if jax.default_backend() != "cpu":
            return False
    except Exception:
        return False
    from .. import native

    return native.available()


def _traverse_impl(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive, tmin):
    if _cpu_native_traversal():
        return _traverse_native(node_rec, leaf_rec, root, ray_o, ray_d, tmax,
                                alive, tmin)
    return _traverse_xla(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive,
                         tmin)


def _traverse_native(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive,
                     tmin):
    R = ray_o.shape[0]
    tm = jnp.where(alive, jnp.minimum(tmax, FLT_MAX), -FLT_MAX)

    def cb(node_rec, leaf_rec, root, o, d, tm):
        from .. import native

        out = native.bvh_traverse(node_rec, leaf_rec, int(root), o, d, tm,
                                  float(tmin))
        if out is None:  # native toggled off between trace and run
            raise RuntimeError("native traversal unavailable at runtime")
        return out

    f32 = jax.ShapeDtypeStruct((R,), jnp.float32)
    i32 = jax.ShapeDtypeStruct((R,), jnp.int32)
    t, tri, u, v = jax.pure_callback(
        cb, (f32, i32, f32, f32), node_rec, leaf_rec, root, ray_o, ray_d, tm)
    # missed-but-alive rays report t = tmax (the XLA loop's init), dead rays
    # report -inf; both carry tri == -1 so intersect_bvh masks dist anyway
    return t, tri, u, v


def _traverse_xla(node_rec, leaf_rec, root, ray_o, ray_d, tmax, alive, tmin):
    R = ray_o.shape[0]
    LS = leaf_rec.shape[1] // 10
    ox, oy, oz = ray_o[:, 0], ray_o[:, 1], ray_o[:, 2]
    dx, dy, dz = ray_d[:, 0], ray_d[:, 1], ray_d[:, 2]
    sd = lambda x: jnp.where(jnp.abs(x) < 1e-12,
                             jnp.where(x >= 0, 1e-12, -1e-12), x)
    ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)

    stack = jnp.zeros((R, STACK_DEPTH), jnp.int32)
    stack = stack.at[:, 0].set(jnp.where(alive, root, -1))
    sp = jnp.where(alive, 1, 0).astype(jnp.int32)
    pos_iota = jnp.arange(STACK_DEPTH, dtype=jnp.int32)[None, :]

    def body(state):
        stack, sp, best_t, best_tri, best_u, best_v = state
        active = sp > 0
        spm = jnp.maximum(sp - 1, 0)
        ref = jnp.take_along_axis(stack, spm[:, None], axis=1)[:, 0]
        ref = jnp.where(active, ref, -1)
        sp = jnp.where(active, spm, sp)
        is_int = ref >= 0
        is_leaf = ref <= -2

        # internal: one gather, four slab tests on (R,) components
        nrec = node_rec[jnp.where(is_int, ref, 0)]
        nt = nrec.T  # (32, R)
        crefs = jax.lax.bitcast_convert_type(nrec[:, 24:28], jnp.int32)
        tn_l, ref_l = [], []
        for k in range(4):
            b = k * 6
            t0x = (nt[b + 0] - ox) * ix
            t1x = (nt[b + 3] - ox) * ix
            t0y = (nt[b + 1] - oy) * iy
            t1y = (nt[b + 4] - oy) * iy
            t0z = (nt[b + 2] - oz) * iz
            t1z = (nt[b + 5] - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin))
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), best_t)) * 1.00000024
            hit_k = is_int & (crefs[:, k] != -1) & (tnear <= tfar)
            tn_l.append(jnp.where(hit_k, tnear, -jnp.inf))
            ref_l.append(jnp.where(hit_k, crefs[:, k], -1))

        # sort descending by tnear so the nearest child is popped first
        def cswap(i, j):
            swap = tn_l[i] < tn_l[j]
            tn_l[i], tn_l[j] = (jnp.where(swap, tn_l[j], tn_l[i]),
                                jnp.where(swap, tn_l[i], tn_l[j]))
            ref_l[i], ref_l[j] = (jnp.where(swap, ref_l[j], ref_l[i]),
                                  jnp.where(swap, ref_l[i], ref_l[j]))

        cswap(0, 1); cswap(2, 3); cswap(0, 2); cswap(1, 3); cswap(1, 2)

        for k in range(4):
            hit_k = ref_l[k] != -1
            mask = hit_k[:, None] & (pos_iota == sp[:, None])
            stack = jnp.where(mask, ref_l[k][:, None], stack)
            sp = sp + hit_k.astype(jnp.int32)

        # leaf: one gather, LS Moller-Trumbore tests on (R,) components
        lid = jnp.where(is_leaf, -ref - 2, 0)
        lrec = leaf_rec[lid]
        lt = lrec.T  # (LS*10, R)
        ids = jax.lax.bitcast_convert_type(lrec[:, LS * 9:], jnp.int32)
        for k in range(LS):
            b = k * 9
            p0x, p0y, p0z = lt[b], lt[b + 1], lt[b + 2]
            e1x = lt[b + 3] - p0x
            e1y = lt[b + 4] - p0y
            e1z = lt[b + 5] - p0z
            e2x = lt[b + 6] - p0x
            e2y = lt[b + 7] - p0y
            e2z = lt[b + 8] - p0z
            pvx = dy * e2z - dz * e2y
            pvy = dz * e2x - dx * e2z
            pvz = dx * e2y - dy * e2x
            det = e1x * pvx + e1y * pvy + e1z * pvz
            inv = 1.0 / jnp.where(det != 0, det, 1.0)
            tvx, tvy, tvz = ox - p0x, oy - p0y, oz - p0z
            u = (tvx * pvx + tvy * pvy + tvz * pvz) * inv
            qvx = tvy * e1z - tvz * e1y
            qvy = tvz * e1x - tvx * e1z
            qvz = tvx * e1y - tvy * e1x
            v = (dx * qvx + dy * qvy + dz * qvz) * inv
            tt = (e2x * qvx + e2y * qvy + e2z * qvz) * inv
            hit_k = (
                is_leaf & (det != 0) & (u >= 0) & (u <= 1) & (v >= 0)
                & (u + v <= 1) & (tt >= tmin) & (tt <= best_t)
                & (ids[:, k] >= 0))
            best_t = jnp.where(hit_k, tt, best_t)
            best_tri = jnp.where(hit_k, ids[:, k], best_tri)
            best_u = jnp.where(hit_k, u, best_u)
            best_v = jnp.where(hit_k, v, best_v)

        return stack, sp, best_t, best_tri, best_u, best_v

    def cond(state):
        return jnp.any(state[1] > 0)

    init = (
        stack, sp, tmax, jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R,), jnp.float32), jnp.zeros((R,), jnp.float32),
    )
    _, _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, init)
    return best_t, best_tri, best_u, best_v
