"""BVH: host-side numpy builder + stackless device traversal.

Design (TPU-first, not a port of yocto_bvh.cpp): instance transforms are baked
into a single world-space triangle soup at flatten time, so one single-level
BVH replaces the reference's two-level TLAS+BLAS
(/root/reference/libs/yocto/yocto_bvh.cpp:574-673) — no per-instance ray
transforms in the hot loop. The tree is *threaded*: every node stores a
miss-link (skip the subtree); the hit-link is implicit (node+1 = first child
in DFS preorder), so traversal is a single `lax.while_loop` over a node
cursor with no per-ray stack — the canonical SIMT layout for lock-step
vectorized rays.

Memory layout tuned for XLA gather cost (the hot-loop bottleneck):
  - node record = ONE (N, 8) float32 row: [min.xyz, max.xyz, miss|bits,
    leaf|bits] — a single gather per traversal step;
  - leaf triangles live in a separate (L, LEAF_SIZE*9) contiguous row array —
    a single gather per leaf visit (vs 4 scattered triangle reads);
  - dead rays enter with cursor -1 and cost nothing (loop ends at the max
    iteration count among *live* rays).

Builder uses median splits on the largest centroid axis (balanced depth: wall
time of lock-step traversal is the max nodes visited by any ray in the batch).
"""

from __future__ import annotations

from collections import defaultdict
from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vecmath import FLT_MAX, RAY_EPS
from .intersect import intersect_triangles_one

LEAF_SIZE = 4


class BvhArrays(NamedTuple):
    node_rec: jnp.ndarray    # (N, 8) float32: min3, max3, miss(bits), leaf(bits)
    leaf_rec: jnp.ndarray    # (L, 40) float32: LEAF_SIZE x 9 coords + 4 ids(bits)
    # layout per leaf row: [tri0 p0xyz p1xyz p2xyz, tri1 ..., tri3 ..., id0..id3]


def build_bvh(tri_pos: np.ndarray):
    """tri_pos: (T, 3, 3) world-space triangle vertices.

    Returns (BvhArrays of numpy arrays, perm): perm reorders triangles so leaf
    slots index the permuted order; apply perm to all per-triangle arrays.
    """
    T = tri_pos.shape[0]
    if T == 0:
        rec = np.zeros((1, 8), np.float32)
        rec[:, 6] = np.float32(np.array([-1], np.int32).view(np.float32)[0])
        rec[:, 7] = rec[:, 6]
        leaf_rec = np.zeros((1, 40), np.float32)
        leaf_rec[:, 36:] = np.full(4, -1, np.int32).view(np.float32)
        return (
            BvhArrays(node_rec=rec, leaf_rec=leaf_rec),
            np.zeros(0, np.int64),
        )
    bb_min = tri_pos.min(axis=1)
    bb_max = tri_pos.max(axis=1)
    centers = (bb_min + bb_max) * 0.5
    perm = np.arange(T)

    node_min, node_max, node_leaf, spans = [], [], [], []
    stack = [(0, T, 0)]
    while stack:
        start, end, depth = stack.pop()
        ids = perm[start:end]
        node_min.append(bb_min[ids].min(axis=0))
        node_max.append(bb_max[ids].max(axis=0))
        spans.append((start, end))
        count = end - start
        if count <= LEAF_SIZE or depth > 60:
            node_leaf.append((start, min(count, LEAF_SIZE)))
            continue
        c = centers[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        perm[start:end] = ids[order]
        mid = start + count // 2
        node_leaf.append(None)
        stack.append((mid, end, depth + 1))
        stack.append((start, mid, depth + 1))

    N = len(node_min)
    spans = np.asarray(spans, np.int64)

    # miss link of node i: first node after i in preorder whose span starts at
    # span_end[i]; -1 if none
    by_start = defaultdict(list)
    for j in range(N):
        by_start[int(spans[j, 0])].append(j)
    miss = np.full(N, -1, np.int32)
    for i in range(N):
        for j in by_start.get(int(spans[i, 1]), ()):
            if j > i:
                miss[i] = j
                break

    # leaves: contiguous permuted ranges -> packed flat rows
    leaf_rows, node_leaf_idx = [], np.full(N, -1, np.int32)
    tri_pos_perm = tri_pos[perm]
    for i in range(N):
        if node_leaf[i] is None:
            continue
        start, count = node_leaf[i]
        node_leaf_idx[i] = len(leaf_rows)
        row = np.zeros(40, np.float32)
        tris = np.zeros((LEAF_SIZE, 9), np.float32)
        tris[:count] = tri_pos_perm[start:start + count].reshape(count, 9)
        # degenerate padding triangles never intersect (det == 0 rejected)
        row[:36] = tris.reshape(-1)
        ids = np.full(LEAF_SIZE, -1, np.int32)
        ids[:count] = np.arange(start, start + count, dtype=np.int32)
        row[36:] = ids.view(np.float32)
        leaf_rows.append(row)

    rec = np.zeros((N, 8), np.float32)
    rec[:, 0:3] = np.asarray(node_min, np.float32)
    rec[:, 3:6] = np.asarray(node_max, np.float32)
    rec[:, 6] = miss.view(np.float32)
    rec[:, 7] = node_leaf_idx.view(np.float32)

    arrays = BvhArrays(
        node_rec=rec,
        leaf_rec=np.stack(leaf_rows).astype(np.float32),
    )
    return arrays, perm


# ---------------------------------------------------------------------------
# device traversal
# ---------------------------------------------------------------------------

def intersect_bvh(bvh: BvhArrays, tri_pos, ray_o, ray_d, tmax=None,
                  tmin=RAY_EPS, alive=None):
    """Closest-hit over batched rays via threaded-BVH while_loop.

    ray_o, ray_d: (R, 3). alive: optional (R,) bool — dead rays skip traversal
    entirely. Returns dict(hit (R,), dist (R,), tri (R,), uv (R,2)).
    tri indexes the *permuted* triangle arrays. The bbox test inflates t_far
    by 1.00000024 like the reference slab test (yocto_geometry.h:855).
    tri_pos is unused (kept for API compat); leaf rows carry the geometry.

    Differentiation: traversal is wrapped in a zero-gradient custom_vjp —
    visibility is a step function, so path gradients flow through materials /
    volume coefficients, not hit geometry (SURVEY.md §7.9, BASELINE.json).
    """
    R = ray_o.shape[0]
    if tmax is None:
        tmax = jnp.full((R,), FLT_MAX, jnp.float32)
    start_cur = jnp.zeros((R,), jnp.int32)
    if alive is not None:
        start_cur = jnp.where(alive, 0, -1)
    best_t, best_tri, best_uv = _traverse(
        bvh.node_rec, bvh.leaf_rec, ray_o, ray_d,
        jnp.minimum(tmax, FLT_MAX), start_cur, float(tmin))
    hit = best_tri >= 0
    return {
        "hit": hit,
        "dist": jnp.where(hit, best_t, FLT_MAX),
        "tri": best_tri,
        "uv": best_uv,
    }


@partial(jax.custom_vjp, nondiff_argnums=(6,))
def _traverse(node_rec, leaf_rec, ray_o, ray_d, tmax, start_cur, tmin):
    return _traverse_impl(node_rec, leaf_rec, ray_o, ray_d, tmax, start_cur,
                          tmin)


def _traverse_fwd(node_rec, leaf_rec, ray_o, ray_d, tmax, start_cur, tmin):
    out = _traverse_impl(node_rec, leaf_rec, ray_o, ray_d, tmax, start_cur,
                         tmin)
    return out, (node_rec.shape, leaf_rec.shape, ray_o.shape, tmax.shape,
                 start_cur.shape)


def _traverse_bwd(tmin, res, g):
    node_shape, leaf_shape, ray_shape, tmax_shape, cur_shape = res
    return (
        jnp.zeros(node_shape, jnp.float32),
        jnp.zeros(leaf_shape, jnp.float32),
        jnp.zeros(ray_shape, jnp.float32),
        jnp.zeros(ray_shape, jnp.float32),
        jnp.zeros(tmax_shape, jnp.float32),
        jnp.zeros(cur_shape, jnp.int32),
    )


_traverse.defvjp(_traverse_fwd, _traverse_bwd)


def _traverse_impl(node_rec, leaf_rec, ray_o, ray_d, tmax, start_cur, tmin):
    bvh = BvhArrays(node_rec=node_rec, leaf_rec=leaf_rec)
    R = ray_o.shape[0]
    safe_d = jnp.where(jnp.abs(ray_d) < 1e-12,
                       jnp.where(ray_d >= 0, 1e-12, -1e-12), ray_d)
    inv_d = 1.0 / safe_d

    def body(state):
        cur, best_t, best_tri, best_uv = state
        active = cur >= 0
        node = jnp.maximum(cur, 0)
        rec = bvh.node_rec[node]  # (R, 8) single gather
        nmin = rec[:, 0:3]
        nmax = rec[:, 3:6]
        miss = jax.lax.bitcast_convert_type(rec[:, 6], jnp.int32)
        leaf = jax.lax.bitcast_convert_type(rec[:, 7], jnp.int32)

        t0 = (nmin - ray_o) * inv_d
        t1 = (nmax - ray_o) * inv_d
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t_near = jnp.maximum(jnp.max(tn, axis=-1), tmin)
        t_far = jnp.minimum(jnp.min(tf, axis=-1), best_t) * 1.00000024
        bbox_hit = (t_near <= t_far) & active

        is_leaf = leaf >= 0
        do_prims = bbox_hit & is_leaf
        leaf_idx = jnp.where(do_prims, leaf, 0)
        lrec = bvh.leaf_rec[leaf_idx]     # (R, 40) single gather
        ids = jax.lax.bitcast_convert_type(lrec[:, 36:40], jnp.int32)
        # unrolled per-slot Moller-Trumbore on (R,)-shaped columns: keeps all
        # elementwise work fully lane-utilized (minor-dim-4 layouts waste the
        # 128-lane VPU)
        for k in range(LEAF_SIZE):
            base = k * 9
            p0 = lrec[:, base + 0:base + 3]
            p1 = lrec[:, base + 3:base + 6]
            p2 = lrec[:, base + 6:base + 9]
            t_k, uv_k, hit_k = intersect_triangles_one(
                ray_o, ray_d, p0, p1, p2, tmin, best_t)
            hit_k = hit_k & do_prims & (ids[:, k] >= 0)
            take = hit_k & (t_k < best_t)
            best_t = jnp.where(take, t_k, best_t)
            best_tri = jnp.where(take, ids[:, k], best_tri)
            best_uv = jnp.where(take[:, None], uv_k, best_uv)

        nxt = jnp.where(bbox_hit & ~is_leaf, cur + 1, miss)
        cur = jnp.where(active, nxt, cur)
        return cur, best_t, best_tri, best_uv

    def cond(state):
        return jnp.any(state[0] >= 0)

    init = (
        start_cur,
        jnp.minimum(tmax, FLT_MAX),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R, 2), jnp.float32),
    )
    cur, best_t, best_tri, best_uv = jax.lax.while_loop(cond, body, init)
    return best_t, best_tri, best_uv
