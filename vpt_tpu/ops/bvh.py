"""BVH: host-side numpy builder + stackless device traversal.

Design (TPU-first, not a port of yocto_bvh.cpp): instance transforms are baked
into a single world-space triangle soup at flatten time, so one single-level
BVH replaces the reference's two-level TLAS+BLAS
(/root/reference/libs/yocto/yocto_bvh.cpp:574-673) — no per-instance ray
transforms in the hot loop. The tree is *threaded*: traversal follows an
implicit hit-link (internal node -> node+1 in DFS preorder = first child) or a
precomputed miss-link (skip the subtree), so it is a single `lax.while_loop`
over a node cursor with no per-ray stack — the canonical SIMT-friendly layout
for lock-step vectorized rays. Leaves hold up to LEAF_SIZE triangles, padded
with -1 (matching the reference's <=4 prims/leaf, yocto_bvh.cpp:444).

Builder uses median splits on the largest centroid axis (balanced depth: wall
time of lock-step traversal is the max nodes visited by any ray in the batch).
"""

from __future__ import annotations

from collections import defaultdict
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from ..core.vecmath import FLT_MAX, RAY_EPS
from .intersect import intersect_triangles_one

LEAF_SIZE = 4


class BvhArrays(NamedTuple):
    node_min: jnp.ndarray    # (N, 3) float32
    node_max: jnp.ndarray    # (N, 3) float32
    node_prims: jnp.ndarray  # (N, LEAF_SIZE) int32, -1 padded; all -1 => internal
    node_miss: jnp.ndarray   # (N,) int32, -1 terminates


def build_bvh(tri_pos: np.ndarray):
    """tri_pos: (T, 3, 3) world-space triangle vertices.

    Returns (BvhArrays of numpy arrays, perm): perm reorders triangles so leaf
    slots index the permuted order; apply perm to all per-triangle arrays.
    """
    T = tri_pos.shape[0]
    if T == 0:
        return (
            BvhArrays(
                node_min=np.zeros((1, 3), np.float32),
                node_max=np.zeros((1, 3), np.float32),
                node_prims=-np.ones((1, LEAF_SIZE), np.int32),
                node_miss=-np.ones(1, np.int32),
            ),
            np.zeros(0, np.int64),
        )
    bb_min = tri_pos.min(axis=1)
    bb_max = tri_pos.max(axis=1)
    centers = (bb_min + bb_max) * 0.5
    perm = np.arange(T)

    node_min, node_max, node_prims, spans = [], [], [], []
    # explicit stack, children pushed right-then-left => DFS preorder output
    stack = [(0, T, 0)]
    while stack:
        start, end, depth = stack.pop()
        ids = perm[start:end]
        node_min.append(bb_min[ids].min(axis=0))
        node_max.append(bb_max[ids].max(axis=0))
        spans.append((start, end))
        count = end - start
        if count <= LEAF_SIZE or depth > 60:
            prims = np.full(LEAF_SIZE, -1, np.int64)
            prims[: min(count, LEAF_SIZE)] = ids[: min(count, LEAF_SIZE)]
            node_prims.append(prims)
            continue
        c = centers[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        perm[start:end] = ids[order]
        mid = start + count // 2
        node_prims.append(np.full(LEAF_SIZE, -1, np.int64))
        stack.append((mid, end, depth + 1))
        stack.append((start, mid, depth + 1))

    N = len(node_min)
    node_min = np.asarray(node_min, np.float32)
    node_max = np.asarray(node_max, np.float32)
    node_prims_arr = np.asarray(node_prims, np.int64)
    spans = np.asarray(spans, np.int64)

    # miss link of node i: first node after i in preorder whose span starts at
    # span_end[i] (the node right after i's subtree); -1 if none.
    by_start = defaultdict(list)
    for j in range(N):
        by_start[int(spans[j, 0])].append(j)
    miss = np.full(N, -1, np.int64)
    for i in range(N):
        for j in by_start.get(int(spans[i, 1]), ()):
            if j > i:
                miss[i] = j
                break

    # leaf slots hold original tri ids; remap to permuted positions so the
    # traversal gathers from permuted triangle arrays
    inv_perm = np.empty(T, np.int64)
    inv_perm[perm] = np.arange(T)
    prims_permuted = np.where(node_prims_arr >= 0, inv_perm[node_prims_arr], -1)

    arrays = BvhArrays(
        node_min=node_min,
        node_max=node_max,
        node_prims=prims_permuted.astype(np.int32),
        node_miss=miss.astype(np.int32),
    )
    return arrays, perm


# ---------------------------------------------------------------------------
# device traversal
# ---------------------------------------------------------------------------

def intersect_bvh(bvh: BvhArrays, tri_pos, ray_o, ray_d, tmax=None, tmin=RAY_EPS,
                  max_iters: int = 16384):
    """Closest-hit over batched rays via threaded-BVH while_loop.

    ray_o, ray_d: (R, 3). Returns dict(hit (R,), dist (R,), tri (R,), uv (R,2)).
    tri ids index the *permuted* triangle arrays. The bbox test inflates t_far
    by 1.00000024 like the reference slab test (yocto_geometry.h:855).
    """
    R = ray_o.shape[0]
    if tmax is None:
        tmax = jnp.full((R,), FLT_MAX, jnp.float32)
    safe_d = jnp.where(jnp.abs(ray_d) < 1e-12, jnp.where(ray_d >= 0, 1e-12, -1e-12), ray_d)
    inv_d = 1.0 / safe_d

    def body(state):
        cur, best_t, best_tri, best_uv = state
        active = cur >= 0
        node = jnp.maximum(cur, 0)
        nmin = bvh.node_min[node]
        nmax = bvh.node_max[node]
        t0 = (nmin - ray_o) * inv_d
        t1 = (nmax - ray_o) * inv_d
        tn = jnp.minimum(t0, t1)
        tf = jnp.maximum(t0, t1)
        t_near = jnp.maximum(jnp.max(tn, axis=-1), tmin)
        t_far = jnp.minimum(jnp.min(tf, axis=-1), best_t) * 1.00000024
        bbox_hit = (t_near <= t_far) & active

        prims = bvh.node_prims[node]  # (R, LEAF)
        is_leaf = prims[:, 0] >= 0

        do_prims = bbox_hit & is_leaf
        tri_ids = jnp.where(do_prims[:, None], jnp.maximum(prims, 0), 0)
        valid = (prims >= 0) & do_prims[:, None]
        v = tri_pos[tri_ids]  # (R, LEAF, 3, 3)
        t_hit, uv_hit, hit_mask = intersect_triangles_one(
            ray_o[:, None, :], ray_d[:, None, :], v[..., 0, :], v[..., 1, :],
            v[..., 2, :], tmin, best_t[:, None]
        )
        hit_mask = hit_mask & valid
        t_hit = jnp.where(hit_mask, t_hit, FLT_MAX)
        k = jnp.argmin(t_hit, axis=-1)
        t_min_leaf = jnp.take_along_axis(t_hit, k[:, None], axis=-1)[:, 0]
        new_best = jnp.any(hit_mask, axis=-1) & (t_min_leaf < best_t)
        best_t = jnp.where(new_best, t_min_leaf, best_t)
        best_tri = jnp.where(
            new_best, jnp.take_along_axis(tri_ids, k[:, None], axis=-1)[:, 0], best_tri
        )
        uv_sel = jnp.take_along_axis(uv_hit, k[:, None, None], axis=-2)[:, 0, :]
        best_uv = jnp.where(new_best[:, None], uv_sel, best_uv)

        miss = bvh.node_miss[node]
        nxt = jnp.where(bbox_hit & ~is_leaf, cur + 1, miss)
        cur = jnp.where(active, nxt, cur)
        return cur, best_t, best_tri, best_uv

    def cond(state):
        return jnp.any(state[0] >= 0)

    init = (
        jnp.zeros((R,), jnp.int32),
        jnp.minimum(tmax, FLT_MAX),
        jnp.full((R,), -1, jnp.int32),
        jnp.zeros((R, 2), jnp.float32),
    )
    cur, best_t, best_tri, best_uv = jax.lax.while_loop(cond, body, init)
    hit = best_tri >= 0
    return {
        "hit": hit,
        "dist": jnp.where(hit, best_t, FLT_MAX),
        "tri": best_tri,
        "uv": best_uv,
    }
