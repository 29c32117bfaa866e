"""Pallas TPU packet-traversal kernel for the 4-wide BVH.

Why a kernel: the pure-XLA traversal (ops/bvh.py) is a *global* lock-step
while-loop whose per-iteration cost is two HBM gathers over every ray — TPU
gathers are slow and the loop runs until the single worst ray finishes.
This kernel replaces per-ray stacks with the classic *packet* scheme mapped
onto the TPU's SIMD shape: one ray block (BLOCK_ROWS x 128 rays) per grid
step shares ONE scalar stack in SMEM; each iteration pops one node id
(scalar), reads its record from a VMEM-resident table (scalar-indexed row
load, no gather), and tests the four child slabs / four leaf triangles
against the whole block on the VPU. Blocks exit their while-loop as soon as
*their* rays are done (per-block early-out instead of global).

VMEM layout: Mosaic pads the minor dim to 128 lanes, so records are packed
into full 128-lane rows to avoid 4x padding waste (which OOMs scoped VMEM):
  nodes  (ceil(N/4), 128) f32 — 4 nodes/row, 32 floats each:
         24 slab floats + 4 child refs stored as exact f32 values + 4 pad
  leaves (ceil(L/3), 128) f32 — 3 leaves/row, 40 floats each:
         4 triangles x 9 coords + 4 triangle ids as f32 (exact below 2^24)
Child ref encoding matches ops/bvh.py: >=0 internal, <=-2 leaf -(ref+2),
-1 empty. Sub-row extraction is a lax.switch over static lane slices (no
dynamic lane indexing, no bitcasts in the hot loop).

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

LANES = 128
BLOCK_ROWS = 16          # 16 x 128 = 2048 rays per packet
STACK_DEPTH = 96
RESIDENT_BYTES = 10 * 1024 * 1024  # VMEM-resident BVH budget
NEG_INF = float(np.float32(-np.inf))
NODES_PER_ROW = 4        # 32 floats per node
LEAVES_PER_ROW = 3       # 40 floats per leaf (LS=4 triangles)


class PallasBvh(NamedTuple):
    nodes: jnp.ndarray   # (ceil(N/4), 128) f32 packed node records
    leaves: jnp.ndarray  # (ceil(L/3), 128) f32 packed leaf records
    root: jnp.ndarray    # () i32


def from_bvh_arrays(bvh) -> PallasBvh:
    """Pack ops/bvh.py's (N,32)/(L,40) records into full 128-lane rows,
    converting the bit-cast int refs/ids to exact float values."""
    node_rec = np.asarray(bvh.node_rec).copy()
    leaf_rec = np.asarray(bvh.leaf_rec).copy()
    ls = leaf_rec.shape[1] // 10
    assert ls == 4, "packed layout assumes LEAF_SIZE == 4"
    # child refs / tri ids: stored as int bits -> store as float values
    node_rec[:, 24:28] = node_rec[:, 24:28].view(np.int32).astype(np.float32)
    leaf_rec[:, ls * 9:] = leaf_rec[:, ls * 9:].view(np.int32).astype(
        np.float32)
    N, L = node_rec.shape[0], leaf_rec.shape[0]
    nrows = -(-N // NODES_PER_ROW)
    lrows = -(-L // LEAVES_PER_ROW)
    nodes = np.zeros((nrows, LANES), np.float32)
    node_pad = np.zeros((nrows * NODES_PER_ROW, 32), np.float32)
    node_pad[:N] = node_rec
    nodes[:] = node_pad.reshape(nrows, NODES_PER_ROW * 32)
    leaves = np.full((lrows, LANES), -1.0, np.float32)
    leaf_pad = np.full((lrows * LEAVES_PER_ROW, 40), -1.0, np.float32)
    leaf_pad[:L] = leaf_rec
    leaves[:, : LEAVES_PER_ROW * 40] = leaf_pad.reshape(
        lrows, LEAVES_PER_ROW * 40)
    return PallasBvh(nodes=nodes, leaves=leaves, root=np.int32(bvh.root))


def _kernel(root_ref, nodes_ref, leaves_ref,
            ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
            t_out, tri_out, u_out, v_out, stack_ref,
            nrow_scratch, lrow_scratch, nsem, lsem,
            tmin: float, resident: bool):
    ox, oy, oz = ox_ref[:], oy_ref[:], oz_ref[:]
    dx, dy, dz = dx_ref[:], dy_ref[:], dz_ref[:]
    sd = lambda x: jnp.where(jnp.abs(x) < 1e-12,
                             jnp.where(x >= 0, 1e-12, -1e-12), x)
    ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)
    tmax = tmax_ref[:]
    any_live = jnp.any(tmax > tmin)

    root = root_ref[0]
    stack_ref[0] = jnp.where(any_live, root, -1)
    zero_i = jnp.zeros_like(tmax, jnp.int32)

    def cond(c):
        return c[0] > 0

    def internal(ref, sp, best_t, best_tri, best_u, best_v):
        # --- internal node: 4 slab tests over the whole packet ---------
        if resident:
            nrow = nodes_ref[pl.ds(ref // NODES_PER_ROW, 1), :]  # (1, 128)
        else:
            # BVH larger than VMEM: tables live in HBM, fetch one row
            cp = pltpu.make_async_copy(
                nodes_ref.at[pl.ds(ref // NODES_PER_ROW, 1), :],
                nrow_scratch, nsem)
            cp.start()
            cp.wait()
            nrow = nrow_scratch[:]
        rec_2d = jax.lax.switch(
            ref % NODES_PER_ROW,
            [lambda r=nrow, j=j: jax.lax.slice(r, (0, j * 32), (1, j * 32 + 32))
             for j in range(NODES_PER_ROW)])
        rec = lambda i: rec_2d[0, i]
        tn_s, ref_s = [], []
        for k in range(4):
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
            kid = rec(24 + k).astype(jnp.int32)
            # packet-order key doubles as the hit-any flag (< FLT_MAX)
            tn_k = jnp.min(jnp.where(tnear <= tfar, tnear, FLT_MAX))
            any_k = (kid != -1) & (tn_k < FLT_MAX)
            tn_s.append(jnp.where(any_k, tn_k, NEG_INF))
            ref_s.append(jnp.where(any_k, kid, -1))

        # sort children far-to-near (descending key => nearest popped last)
        def cswap(i, j):
            swap = tn_s[i] < tn_s[j]
            tn_s[i], tn_s[j] = (jnp.where(swap, tn_s[j], tn_s[i]),
                                jnp.where(swap, tn_s[i], tn_s[j]))
            ref_s[i], ref_s[j] = (jnp.where(swap, ref_s[j], ref_s[i]),
                                  jnp.where(swap, ref_s[i], ref_s[j]))

        cswap(0, 1); cswap(2, 3); cswap(0, 2); cswap(1, 3); cswap(1, 2)

        for k in range(4):
            do_push = ref_s[k] != -1

            @pl.when(do_push)
            def _(k=k, sp=sp):
                stack_ref[sp] = ref_s[k]

            sp = sp + do_push.astype(jnp.int32)
        return sp, best_t, best_tri, best_u, best_v

    def leaf(ref, sp, best_t, best_tri, best_u, best_v):
        # --- leaf: 4 triangle tests over the whole packet ---------------
        lidx = -ref - 2
        if resident:
            lrow = leaves_ref[pl.ds(lidx // LEAVES_PER_ROW, 1), :]  # (1, 128)
        else:
            cp = pltpu.make_async_copy(
                leaves_ref.at[pl.ds(lidx // LEAVES_PER_ROW, 1), :],
                lrow_scratch, lsem)
            cp.start()
            cp.wait()
            lrow = lrow_scratch[:]
        lrec_2d = jax.lax.switch(
            lidx % LEAVES_PER_ROW,
            [lambda r=lrow, j=j: jax.lax.slice(r, (0, j * 40), (1, j * 40 + 40))
             for j in range(LEAVES_PER_ROW)])
        lrec = lambda i: lrec_2d[0, i]
        for k in range(4):
            b = k * 9
            p0x, p0y, p0z = lrec(b), lrec(b + 1), lrec(b + 2)
            e1x = lrec(b + 3) - p0x
            e1y = lrec(b + 4) - p0y
            e1z = lrec(b + 5) - p0z
            e2x = lrec(b + 6) - p0x
            e2y = lrec(b + 7) - p0y
            e2z = lrec(b + 8) - p0z
            tid = lrec(36 + k).astype(jnp.int32)
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
        return sp, best_t, best_tri, best_u, best_v

    def body(c):
        sp, best_t, best_tri, best_u, best_v = c
        ref = stack_ref[sp - 1]
        sp = sp - 1
        # real scalar branch: leaves skip the slab tests, internals skip the
        # triangle tests (~2x less VPU work than fully-masked execution)
        return jax.lax.cond(ref >= 0, internal, leaf,
                            ref, sp, best_t, best_tri, best_u, best_v)

    sp0 = jnp.where(any_live, 1, 0).astype(jnp.int32)
    _, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
        cond, body, (sp0, tmax, zero_i - 1, tmax * 0.0, tmax * 0.0))
    t_out[:] = best_t
    tri_out[:] = best_tri
    u_out[:] = best_u
    v_out[:] = best_v


def _traverse_pallas_impl(bvh: PallasBvh, ray_o, ray_d, tmax, tmin: float,
                          interpret: bool = False,
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
    # over the 2048-ray packet)
    resident = (bvh.nodes.size + bvh.leaves.size) * 4 <= RESIDENT_BYTES

    bvh_space = pltpu.VMEM if resident else pltpu.ANY
    full = lambda a: pl.BlockSpec(a.shape, lambda i: (0,) * a.ndim,
                                  memory_space=bvh_space)
    rblk = pl.BlockSpec((block_rows, LANES), lambda i: (i, 0),
                        memory_space=pltpu.VMEM)
    shape = jax.ShapeDtypeStruct((rows, LANES), jnp.float32)
    ishape = jax.ShapeDtypeStruct((rows, LANES), jnp.int32)

    t, tri, u, v = pl.pallas_call(
        partial(_kernel, tmin=float(tmin), resident=resident),
        grid=(grid,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),  # root
            full(bvh.nodes), full(bvh.leaves),
            rblk, rblk, rblk, rblk, rblk, rblk, rblk,
        ],
        out_specs=(rblk, rblk, rblk, rblk),
        out_shape=(shape, ishape, shape, shape),
        scratch_shapes=[
            pltpu.SMEM((STACK_DEPTH,), jnp.int32),
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


@partial(jax.custom_vjp, nondiff_argnums=(4, 5))
def _traverse_pallas(bvh, ray_o, ray_d, tmax, tmin, interpret):
    return _traverse_pallas_impl(bvh, ray_o, ray_d, tmax, tmin, interpret)


def _fwd(bvh, ray_o, ray_d, tmax, tmin, interpret):
    out = _traverse_pallas_impl(bvh, ray_o, ray_d, tmax, tmin, interpret)
    return out, (jax.tree.map(jnp.shape, bvh), ray_o.shape, tmax.shape)


def _bwd(tmin, interpret, res, g):
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
                         tmin=RAY_EPS, alive=None, interpret=False):
    """Drop-in replacement for ops.bvh.intersect_bvh on the Pallas path."""
    R = ray_o.shape[0]
    if tmax is None:
        tmax = jnp.full((R,), FLT_MAX, jnp.float32)
    tmax = jnp.minimum(tmax, FLT_MAX)
    if alive is not None:
        tmax = jnp.where(alive, tmax, NEG_INF)
    best_t, best_tri, best_u, best_v = _traverse_pallas(
        bvh, ray_o, ray_d, tmax, float(tmin), bool(interpret))
    hit = best_tri >= 0
    return {
        "hit": hit,
        "dist": jnp.where(hit, best_t, FLT_MAX),
        "tri": best_tri,
        "uv": jnp.stack([best_u, best_v], axis=-1),
    }
