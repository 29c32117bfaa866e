"""Pallas TPU packet-traversal kernel for the BVH (4-ary build collapsed to
8-wide node records for traversal).

Why a kernel: the pure-XLA traversal (ops/bvh.py) is a *global* lock-step
while-loop whose per-iteration cost is two HBM gathers over every ray — TPU
gathers are slow and the loop runs until the single worst ray finishes.
This kernel maps the classic *packet* scheme onto the TPU's SIMD shape: one
ray block (BLOCK_ROWS x 128 rays) per grid step shares scalar traversal
stacks in SMEM; each pop reads one record row from a VMEM-resident table
(scalar-indexed row load, no gather) and tests it against the whole block on
the VPU. Blocks exit their while-loop as soon as *their* rays are done.

Design (round-3 restructure + round-4 widening, profiled on a v5e):
  - records are stored ONE PER 128-lane ROW (nodes (N,128), leaves (L,128)),
    so a pop is a single dynamic row slice — no lax.switch sub-row extract;
  - node rows are 8-WIDE (the 4-ary build collapsed at pack time,
    _collapse8): ~half the internal pops for ~the same per-pop VPU cost,
    children ordered near-to-far by a Batcher-8 network;
  - internal nodes and leaves live on SEPARATE SMEM stacks; each while-loop
    iteration performs POPS(=2) pops, each pop taking a leaf if any is
    pending else an internal node (leaf-priority drains the leaf stack and
    shrinks best_t early);
  - best t/tri/u/v live in the output VMEM refs and are mutated in place;
    the while-loop carry is two scalars (isp, lsp), so lax.cond branches
    move no vector state;
  - leaves hold LEAF_SIZE=8 triangles; callers pre-sort bounce rays by
    (origin Morton, direction octant) so packet unions stay small
    (ops/bvh.py _intersect_pallas_sorted).

VMEM layout: nodes (N, 128) f32 — 48 slab floats (8 children) + 8 child
refs stored as exact f32 values + pad. leaves (L, 128) f32 — LS triangles x 9 coords + LS
triangle ids as f32 (exact below 2^24) + pad. Child ref encoding matches
ops/bvh.py: >=0 internal, <=-2 leaf -(ref+2), -1 empty.

Semantics are identical to ops/bvh.py::_traverse_impl (same slab test with
the reference's 1.00000024 tmax inflation, yocto_geometry.h:842-868; same
Moller-Trumbore accept conditions, yocto_geometry.h:786-820), verified
element-for-element in tests/test_bvh.py. Traversal is visibility — a step
function — so it is wrapped in the same zero-gradient custom_vjp as the XLA
path (BASELINE.json: path gradients flow through materials/volumes/grids,
not geometry edges).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ..core.vecmath import FLT_MAX, RAY_EPS

import os as _os

LANES = 128
# 32 x 128 = 4096 rays per packet (round-4 sweep: with Morton-sorted
# bounce rays, 32 rows beat 16 by ~8% coherent / ~5% incoherent).
# Env-overridable for tuning sweeps (tools/traversal_sweep.py).
BLOCK_ROWS = int(_os.environ.get("VPT_PALLAS_BLOCK_ROWS", 32))
ISTACK_DEPTH = 96        # internal-node stack
LSTACK_DEPTH = 96        # leaf stack (leaf-priority keeps it shallow)
POPS = int(_os.environ.get("VPT_PALLAS_POPS", 2))  # pops per loop iteration
RESIDENT_BYTES = 10 * 1024 * 1024  # VMEM-resident BVH budget
NEG_INF = float(np.float32(-np.inf))


# children per packed node row: 8 -> 8x6 slabs + 8 refs = 56 lanes;
# 16 -> 96 + 16 = 112 lanes (still one 128-lane row). Wider nodes halve
# internal pops again at the same per-pop VPU cost per child tested.
NODE_WIDTH = int(_os.environ.get("VPT_PALLAS_NODE_WIDTH", 8))


def _batcher_pairs(n):
    """Batcher odd-even mergesort comparator network for n lanes (the
    8-lane network in pop_internal is this sequence for n=8; wider node
    records generate theirs). Verified against random permutations in
    tests/test_bvh.py."""
    pairs = []
    p = 1
    while p < n:
        k = p
        while k >= 1:
            for j in range(k % p, n - k, 2 * k):
                for i in range(min(k, n - j - k)):
                    if (i + j) // (2 * p) == (i + j + k) // (2 * p):
                        pairs.append((i + j, i + j + k))
            k //= 2
        p *= 2
    return pairs


class PallasBvh(NamedTuple):
    nodes: jnp.ndarray   # (N, 128) f32, one 8-wide node record per row
    leaves: jnp.ndarray  # (L, 128) f32, one leaf record per row
    root: jnp.ndarray    # () i32


def _collapse8(node_rec):
    """Collapse the 4-ary tree into 8-wide nodes: each node greedily absorbs
    the children of its internal children while <= 8 slots remain. Halves
    internal pops (the packet kernel's iteration count is the cost driver,
    PERF.md) and visits the IDENTICAL leaf set, so results are unchanged.
    Absorbed rows stay in the table unreferenced (no re-indexing).

    Vectorized over all nodes (ADVICE r4: the per-node Python greedy loop
    added substantial scene-load latency on multi-hundred-thousand-node
    BVHs). Each round, every node expands its largest-area internal child
    that still fits — identical choice sequence (f32 areas, first-max
    tie-break) and identical slot order (pop shifts left, children append
    at the end) as the sequential greedy, so the packed tree is unchanged.

    Returns (slabs (N, 8, 6) f32, refs (N, 8) i32 with -1 empty)."""
    N = node_rec.shape[0]
    refs4 = node_rec[:, 24:28].view(np.int32)
    slabs4 = node_rec[:, :24].reshape(N, 4, 6)

    # left-pack each 4-ary row's children once (the greedy iterates kids in
    # slot order skipping holes)
    order = np.argsort(refs4 == -1, axis=1, kind="stable")
    p4_refs = np.take_along_axis(refs4, order, axis=1)
    p4_slabs = np.take_along_axis(slabs4, order[..., None], axis=1)
    nkids4 = (refs4 != -1).sum(axis=1).astype(np.int32)

    refs = np.full((N, NODE_WIDTH), -1, np.int32)
    slabs = np.zeros((N, NODE_WIDTH, 6), np.float32)
    refs[:, :4] = p4_refs
    slabs[:, :4] = p4_slabs
    cnt = nkids4.copy()

    j_idx = np.arange(NODE_WIDTH)[None, :]
    while True:
        internal = refs >= 0
        sub = nkids4[np.maximum(refs, 0)]
        feasible = (internal & (cnt[:, None] - 1 + sub <= NODE_WIDTH)
                    & (cnt[:, None] < NODE_WIDTH))
        ext = np.maximum(slabs[..., 3:6] - slabs[..., 0:3], np.float32(0.0))
        area = (ext[..., 0] * ext[..., 1] + ext[..., 1] * ext[..., 2]
                + ext[..., 0] * ext[..., 2])
        key = np.where(feasible, area, np.float32(-np.inf))
        b = np.argmax(key, axis=1)  # first max, like the sequential loop
        change = feasible[np.arange(N), b]
        if not change.any():
            break
        ref_exp = refs[np.arange(N), b]
        safe = np.maximum(ref_exp, 0)
        k = np.where(change, nkids4[safe], 0)
        # new row j: old j (j<b) | old j+1 (j<cnt-1) | child j-(cnt-1) | empty
        cm1 = (cnt - 1)[:, None]
        sel = np.where(
            j_idx < b[:, None], j_idx,
            np.where(j_idx < cm1, j_idx + 1,
                     np.where(j_idx < cm1 + k[:, None],
                              NODE_WIDTH + j_idx - cm1, NODE_WIDTH + 4)))
        cand_refs = np.concatenate(
            [refs, p4_refs[safe], np.full((N, 1), -1, np.int32)], axis=1)
        cand_slabs = np.concatenate(
            [slabs, p4_slabs[safe], np.zeros((N, 1, 6), np.float32)], axis=1)
        new_refs = np.take_along_axis(cand_refs, sel, axis=1)
        new_slabs = np.take_along_axis(cand_slabs, sel[..., None], axis=1)
        refs = np.where(change[:, None], new_refs, refs)
        slabs = np.where(change[:, None, None], new_slabs, slabs)
        cnt = np.where(change, cnt - 1 + k, cnt)
    # zero the slab floats of empty (ref == -1) slots: the left-pack above
    # copies stale slab columns for holes, and while traversal masks on
    # kid != -1, the documented packed layout (and any byte-level consumer)
    # expects zeroed empties like the sequential collapse produced
    slabs = np.where((refs != -1)[..., None], slabs, np.float32(0.0))
    return slabs, refs


def _stack_bounds(refs8, root):
    """Worst-case traversal stack requirements of the packed tree.

    Internal stack: popping node n pushes its internal-child count c(n);
    along any DFS path the size right after expanding n is bounded by
    g(n) = c(n) + sum over ancestors a of (c(a) - 1). Computed level-
    synchronously (vectorized per BFS level). Leaf stack: leaf-priority
    drains a node's pushed leaves before the next internal pop, so its
    depth is bounded by max leaf-children per node."""
    if root < 0:
        return 1, 1
    c = (refs8 >= 0).sum(axis=1).astype(np.int64)
    l = (refs8 <= -2).sum(axis=1).astype(np.int64)
    frontier = np.asarray([root])
    g = np.asarray([max(int(c[root]), 1)])
    imax = int(g.max())
    while frontier.size:
        kids = refs8[frontier]                      # (F, 8)
        is_int = kids >= 0
        parent_g = np.broadcast_to(g[:, None], kids.shape)
        nxt = kids[is_int]
        gn = parent_g[is_int] - 1 + c[nxt]
        if nxt.size == 0:
            break
        frontier, g = nxt, np.maximum(gn, 1)
        imax = max(imax, int(g.max()))
    return imax, max(int(l.max(initial=1)), 1)


def from_bvh_arrays(bvh) -> PallasBvh:
    """Pack ops/bvh.py's records into one-record-per-row 128-lane tables:
    nodes collapsed 4-ary -> 8-wide (see _collapse8), leaves as-is, int
    refs/ids stored as exact float values."""
    node_rec = np.asarray(bvh.node_rec)
    leaf_rec = np.asarray(bvh.leaf_rec).copy()
    ls = leaf_rec.shape[1] // 10
    assert ls * 10 <= LANES, f"leaf size {ls} does not fit a 128-lane row"
    ids = leaf_rec[:, ls * 9:].view(np.int32)
    assert ids.max(initial=0) < (1 << 24), "triangle ids exceed f32 exactness"
    leaf_rec[:, ls * 9:] = ids.astype(np.float32)
    N, L = node_rec.shape[0], leaf_rec.shape[0]
    W = NODE_WIDTH
    assert 7 * W <= LANES, f"{W}-wide node records exceed a 128-lane row"
    slabs8, refs8 = _collapse8(node_rec)
    # wide nodes can push up to NODE_WIDTH internal children per pop; a
    # silent SMEM stack overflow would corrupt traversal (ADVICE r4). The
    # packed tree's worst-case requirement is checked at pack time.
    ibound, lbound = _stack_bounds(refs8, int(bvh.root))
    assert ibound <= ISTACK_DEPTH and lbound <= LSTACK_DEPTH, (
        f"BVH traversal stack bound ({ibound} internal / {lbound} leaf) "
        f"exceeds the kernel's SMEM stacks ({ISTACK_DEPTH}/{LSTACK_DEPTH})")
    nodes = np.zeros((N, LANES), np.float32)
    nodes[:, :6 * W] = slabs8.reshape(N, 6 * W)
    nodes[:, 6 * W:7 * W] = refs8.astype(np.float32)
    leaves = np.full((L, LANES), -1.0, np.float32)
    leaves[:, : ls * 10] = leaf_rec
    return PallasBvh(nodes=nodes, leaves=leaves, root=np.int32(bvh.root))


def _kernel(root_ref, nodes_ref, leaves_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_out, tri_out, u_out, v_out, istack_ref, lstack_ref,
            nrow_scratch, lrow_scratch, nsem, lsem,
            tmin: float, resident: bool, ls: int):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    sd = lambda x: jnp.where(jnp.abs(x) < 1e-12,
                             jnp.where(x >= 0, 1e-12, -1e-12), x)
    ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)
    tmax = tmax_ref[:]
    any_live = jnp.any(tmax > tmin)

    t_out[:] = tmax
    tri_out[:] = jnp.full_like(tmax, -1).astype(jnp.int32)
    u_out[:] = tmax * 0.0
    v_out[:] = tmax * 0.0

    root = root_ref[0]
    root_int = root >= 0
    istack_ref[0] = root
    lstack_ref[0] = -root - 2
    isp0 = jnp.where(any_live & root_int, 1, 0).astype(jnp.int32)
    lsp0 = jnp.where(any_live & ~root_int, 1, 0).astype(jnp.int32)

    def node_row(ref):
        if resident:
            return nodes_ref[pl.ds(ref, 1), :]  # (1, 128)
        cp = pltpu.make_async_copy(
            nodes_ref.at[pl.ds(ref, 1), :], nrow_scratch, nsem)
        cp.start()
        cp.wait()
        return nrow_scratch[:]

    def leaf_row(lidx):
        if resident:
            return leaves_ref[pl.ds(lidx, 1), :]
        cp = pltpu.make_async_copy(
            leaves_ref.at[pl.ds(lidx, 1), :], lrow_scratch, lsem)
        cp.start()
        cp.wait()
        return lrow_scratch[:]

    def pop_leaf(isp, lsp):
        lidx = lstack_ref[lsp - 1]
        lrec_2d = leaf_row(lidx)
        lrec = lambda i: lrec_2d[0, i]
        best_t = t_out[:]
        best_tri, best_u, best_v = tri_out[:], u_out[:], v_out[:]
        for k in range(ls):
            b = k * 9
            p0x, p0y, p0z = lrec(b), lrec(b + 1), lrec(b + 2)
            e1x = lrec(b + 3) - p0x
            e1y = lrec(b + 4) - p0y
            e1z = lrec(b + 5) - p0z
            e2x = lrec(b + 6) - p0x
            e2y = lrec(b + 7) - p0y
            e2z = lrec(b + 8) - p0z
            tid = lrec(ls * 9 + k).astype(jnp.int32)
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
                (tid >= 0) & (det != 0)
                & (u >= 0) & (u <= 1) & (v >= 0) & (u + v <= 1)
                & (tt >= tmin) & (tt <= best_t))
            best_t = jnp.where(hit_k, tt, best_t)
            best_tri = jnp.where(hit_k, tid, best_tri)
            best_u = jnp.where(hit_k, u, best_u)
            best_v = jnp.where(hit_k, v, best_v)
        t_out[:] = best_t
        tri_out[:] = best_tri
        u_out[:] = best_u
        v_out[:] = best_v
        return isp, lsp - 1

    def pop_internal(isp, lsp):
        ref = istack_ref[isp - 1]
        isp = isp - 1
        rec_2d = node_row(ref)
        rec = lambda i: rec_2d[0, i]
        best_t = t_out[:]
        tn_s, ref_s = [], []
        for k in range(NODE_WIDTH):
            b = k * 6
            t0x = (rec(b + 0) - ox) * ix
            t1x = (rec(b + 3) - ox) * ix
            t0y = (rec(b + 1) - oy) * iy
            t1y = (rec(b + 4) - oy) * iy
            t0z = (rec(b + 2) - oz) * iz
            t1z = (rec(b + 5) - oz) * iz
            tnear = jnp.maximum(
                jnp.maximum(jnp.minimum(t0x, t1x), jnp.minimum(t0y, t1y)),
                jnp.maximum(jnp.minimum(t0z, t1z), tmin))
            tfar = jnp.minimum(
                jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                jnp.minimum(jnp.maximum(t0z, t1z), best_t)) * 1.00000024
            kid = rec(6 * NODE_WIDTH + k).astype(jnp.int32)
            # packet-order key doubles as the hit-any flag (< FLT_MAX)
            tn_k = jnp.min(jnp.where(tnear <= tfar, tnear, FLT_MAX))
            any_k = (kid != -1) & (tn_k < FLT_MAX)
            tn_s.append(jnp.where(any_k, tn_k, NEG_INF))
            ref_s.append(jnp.where(any_k, kid, -1))

        # sort children far-to-near (descending key => nearest popped first):
        # Batcher odd-even merge network (the historical hand-written
        # sequence for 8-wide nodes; generated for other widths)
        def cswap(i, j):
            swap = tn_s[i] < tn_s[j]
            tn_s[i], tn_s[j] = (jnp.where(swap, tn_s[j], tn_s[i]),
                                jnp.where(swap, tn_s[i], tn_s[j]))
            ref_s[i], ref_s[j] = (jnp.where(swap, ref_s[j], ref_s[i]),
                                  jnp.where(swap, ref_s[i], ref_s[j]))

        net = ((0, 1), (2, 3), (4, 5), (6, 7), (0, 2), (1, 3),
               (4, 6), (5, 7), (1, 2), (5, 6), (0, 4), (3, 7),
               (1, 5), (2, 6), (1, 4), (3, 6), (2, 4), (3, 5),
               (3, 4)) if NODE_WIDTH == 8 else _batcher_pairs(NODE_WIDTH)
        for i, j in net:
            cswap(i, j)

        for k in range(NODE_WIDTH):
            kid = ref_s[k]
            is_int = kid >= 0

            @pl.when(kid != -1)
            def _(kid=kid, is_int=is_int, isp=isp, lsp=lsp):
                @pl.when(is_int)
                def _():
                    istack_ref[isp] = kid

                @pl.when(~is_int)
                def _():
                    lstack_ref[lsp] = -kid - 2

            isp = isp + (is_int & (kid != -1)).astype(jnp.int32)
            lsp = lsp + ((~is_int) & (kid != -1)).astype(jnp.int32)
        return isp, lsp

    def one_pop(isp, lsp):
        # leaf-priority: drains lstack (bounds its depth) and shrinks best_t
        # as early as possible for slab pruning. Nested scalar lax.cond —
        # Mosaic lowers these to real branches (a 3-way lax.switch was
        # measured to cost both bodies every pop).
        def int_or_done(isp, lsp):
            return jax.lax.cond(
                isp > 0, pop_internal, lambda i, l: (i, l), isp, lsp)

        return jax.lax.cond(lsp > 0, pop_leaf, int_or_done, isp, lsp)

    def body(c):
        isp, lsp = c
        for _ in range(POPS):
            isp, lsp = one_pop(isp, lsp)
        return isp, lsp

    def cond(c):
        return c[0] + c[1] > 0

    jax.lax.while_loop(cond, body, (isp0, lsp0))


def _traverse_pallas_impl(bvh: PallasBvh, ray_o, ray_d, tmax, tmin: float,
                          ls: int, interpret: bool = False,
                          block_rows: int = BLOCK_ROWS):
    R = ray_o.shape[0]
    block = block_rows * LANES
    Rp = max(-(-R // block) * block, block)
    pad = Rp - R

    def comp(a, fill=0.0):
        return jnp.pad(a, (0, pad), constant_values=fill).reshape(-1, LANES)

    ox, oy, oz = (comp(ray_o[:, i]) for i in range(3))
    dx, dy, dz = (comp(ray_d[:, i]) for i in range(3))
    tm = comp(tmax, NEG_INF)  # padding rays are dead
    rows = Rp // LANES
    grid = rows // block_rows

    # small BVHs live wholly in VMEM (fast scalar-indexed row loads); BVHs
    # that would blow the ~16MB scoped-VMEM budget stay in HBM and each
    # popped row is DMA'd into a 1-row scratch (512B per pop, amortized
    # over the packet)
    resident = (bvh.nodes.size + bvh.leaves.size) * 4 <= RESIDENT_BYTES

    bvh_space = pltpu.VMEM if resident else pl.ANY
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=bvh_space)
    rblk = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    t, tri, u, v = pl.pallas_call(
        partial(_kernel, tmin=float(tmin), resident=resident, ls=ls),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # root
            full(bvh.nodes), full(bvh.leaves),
            rblk, rblk, rblk, rblk, rblk, rblk, rblk,
        ],
        out_specs=(rblk, rblk, rblk, rblk),
        out_shape=(shape, ishape, shape, shape),
        scratch_shapes=[
            pltpu.SMEM((ISTACK_DEPTH,), jnp.int32),
            pltpu.SMEM((LSTACK_DEPTH,), jnp.int32),
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.VMEM((1, LANES), jnp.float32),
            pltpu.SemaphoreType.DMA,
            pltpu.SemaphoreType.DMA,
        ],
        interpret=interpret,
    )(bvh.root.reshape(1), bvh.nodes, bvh.leaves,
      ox, oy, oz, dx, dy, dz, tm)

    flat = lambda a: a.reshape(-1)[:R]
    return flat(t), flat(tri), flat(u), flat(v)


@partial(jax.custom_vjp, nondiff_argnums=(4, 5, 6))
def _traverse_pallas(bvh, ray_o, ray_d, tmax, tmin, ls, interpret):
    return _traverse_pallas_impl(bvh, ray_o, ray_d, tmax, tmin, ls, interpret)


def _fwd(bvh, ray_o, ray_d, tmax, tmin, ls, interpret):
    out = _traverse_pallas_impl(bvh, ray_o, ray_d, tmax, tmin, ls, interpret)
    return out, (jax.tree.map(jnp.shape, bvh), ray_o.shape, tmax.shape)


def _bwd(tmin, ls, interpret, res, g):
    bvh_shapes, ray_shape, tmax_shape = res
    zero_bvh = PallasBvh(
        nodes=jnp.zeros(bvh_shapes.nodes, jnp.float32),
        leaves=jnp.zeros(bvh_shapes.leaves, jnp.float32),
        root=jnp.zeros((), jnp.int32),
    )
    return (zero_bvh, jnp.zeros(ray_shape, jnp.float32),
            jnp.zeros(ray_shape, jnp.float32),
            jnp.zeros(tmax_shape, jnp.float32))


_traverse_pallas.defvjp(_fwd, _bwd)


def intersect_bvh_pallas(bvh: PallasBvh, ray_o, ray_d, tmax=None,
                         tmin=RAY_EPS, alive=None, interpret=False,
                         ls: int | None = None):
    """Drop-in replacement for ops.bvh.intersect_bvh on the Pallas path.

    ls: triangles per leaf record (static). Defaults to ops.bvh.LEAF_SIZE —
    pass explicitly when the tree was built with a non-default leaf size."""
    from .bvh import LEAF_SIZE

    if ls is None:
        ls = LEAF_SIZE
    R = ray_o.shape[0]
    if tmax is None:
        tmax = jnp.full((R,), FLT_MAX, jnp.float32)
    tmax = jnp.minimum(tmax, FLT_MAX)
    if alive is not None:
        tmax = jnp.where(alive, tmax, NEG_INF)
    best_t, best_tri, best_u, best_v = _traverse_pallas(
        bvh, ray_o, ray_d, tmax, float(tmin), int(ls), bool(interpret))
    hit = best_tri >= 0
    return {
        "hit": hit,
        "dist": jnp.where(hit, best_t, FLT_MAX),
        "tri": best_tri,
        "uv": jnp.stack([best_u, best_v], axis=-1),
    }
