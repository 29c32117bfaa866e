"""Prototype: 4-wide BVH build + lock-step short-stack traversal (SoA math).

Run inside devloop with `r2` (Renderer for 03_volume) in globals, or
standalone on CPU. Measures against the binary threaded traversal and brute
force.
"""

import time

import numpy as np


def build_bvh4(tri_pos, leaf_size=4):
    """Returns dict of arrays:
    node_rec (N, 32) f32: 4 children x (min3,max3) + 4 child refs (bits)
      child ref: >= 0 internal node index; <= -2 => leaf id -(ref+2); -1 empty
    leaf_rec (L, leaf_size*10) f32 rows; perm."""
    T = tri_pos.shape[0]
    bb_min = tri_pos.min(axis=1)
    bb_max = tri_pos.max(axis=1)
    centers = (bb_min + bb_max) * 0.5
    perm = np.arange(T)

    # ranges tree: recursively split into 4 (two median splits)
    nodes = []   # each: list of 4 (start, end) child ranges (or None)
    leaf_rows = []

    def split2(start, end):
        ids = perm[start:end]
        c = centers[ids]
        axis = int(np.argmax(c.max(axis=0) - c.min(axis=0)))
        order = np.argsort(c[:, axis], kind="stable")
        perm[start:end] = ids[order]
        return start + (end - start) // 2

    def emit(start, end, depth):
        """Returns child ref for range [start,end)."""
        count = end - start
        if count <= leaf_size or depth > 40:
            count = min(count, leaf_size)
            row = np.zeros(leaf_size * 10, np.float32)
            tris = np.zeros((leaf_size, 9), np.float32)
            tris[:count] = tri_posp[start:start + count].reshape(count, 9)
            row[:leaf_size * 9] = tris.reshape(-1)
            ids = np.full(leaf_size, -1, np.int32)
            ids[:count] = np.arange(start, start + count)
            row[leaf_size * 9:] = ids.view(np.float32)
            leaf_rows.append(row)
            return -(len(leaf_rows) - 1) - 2
        mid = split2(start, end)
        q1 = split2(start, mid)
        q3 = split2(mid, end)
        my = len(nodes)
        nodes.append(None)  # placeholder
        ranges = [(start, q1), (q1, mid), (mid, q3), (q3, end)]
        refs, boxes = [], []
        for s, e in ranges:
            if e > s:
                refs.append(emit(s, e, depth + 1))
                idsr = perm[s:e]
                boxes.append((bb_min[idsr].min(0), bb_max[idsr].max(0)))
            else:
                refs.append(-1)
                boxes.append((np.full(3, 1e30), np.full(3, -1e30)))
        nodes[my] = (refs, boxes)
        return my

    # NOTE: leaf rows reference permuted positions; we need perm finalized
    # BEFORE packing rows. Two passes: first build ranges+perm, then pack.
    # Simpler: pack after, store (start, count) per leaf.
    import sys
    sys.setrecursionlimit(100000)
    global tri_posp
    tri_posp = None
    leaf_meta = []

    def emit2(start, end, depth):
        count = end - start
        if count <= leaf_size or depth > 40:
            leaf_meta.append((start, min(count, leaf_size)))
            return -(len(leaf_meta) - 1) - 2
        mid = split2(start, end)
        q1 = split2(start, mid)
        q3 = split2(mid, end)
        my = len(nodes)
        nodes.append(None)
        ranges = [(start, q1), (q1, mid), (mid, q3), (q3, end)]
        refs = [emit2(s, e, depth + 1) if e > s else -1 for s, e in ranges]
        nodes[my] = (refs, ranges)
        return my

    nodes.clear()
    leaf_rows.clear()
    root = emit2(0, T, 0)
    tri_posp = tri_pos[perm]

    N = max(len(nodes), 1)
    node_rec = np.zeros((N, 32), np.float32)
    for i, (refs, ranges) in enumerate(nodes):
        for k, ((s, e), ref) in enumerate(zip(ranges, refs)):
            if e > s:
                idsr = np.arange(s, e)
                lo = tri_posp[idsr].min(axis=(0, 1))
                hi = tri_posp[idsr].max(axis=(0, 1))
            else:
                lo = np.full(3, 1e30, np.float32)
                hi = np.full(3, -1e30, np.float32)
            node_rec[i, k * 6:k * 6 + 3] = lo
            node_rec[i, k * 6 + 3:k * 6 + 6] = hi
        node_rec[i, 24:28] = np.asarray(refs, np.int32).view(np.float32)

    L = len(leaf_meta)
    leaf_rec = np.zeros((L, leaf_size * 10), np.float32)
    for li, (start, count) in enumerate(leaf_meta):
        tris = np.zeros((leaf_size, 9), np.float32)
        tris[:count] = tri_posp[start:start + count].reshape(count, 9)
        leaf_rec[li, :leaf_size * 9] = tris.reshape(-1)
        ids = np.full(leaf_size, -1, np.int32)
        ids[:count] = np.arange(start, start + count)
        leaf_rec[li, leaf_size * 9:] = ids.view(np.float32)

    return {
        "node_rec": node_rec,
        "leaf_rec": leaf_rec,
        "perm": perm,
        "root": root,
        "leaf_size": leaf_size,
    }


def make_intersect4(bvh4, stack_depth=48):
    import jax
    import jax.numpy as jnp

    node_rec = jnp.asarray(bvh4["node_rec"])
    leaf_rec = jnp.asarray(bvh4["leaf_rec"])
    root = int(bvh4["root"])
    LS = bvh4["leaf_size"]

    def isect(o, d, tmax0=1e30):
        R = o.shape[0]
        ox, oy, oz = o[:, 0], o[:, 1], o[:, 2]
        dx, dy, dz = d[:, 0], d[:, 1], d[:, 2]
        sd = lambda x: jnp.where(jnp.abs(x) < 1e-12, 1e-12, x)
        ix, iy, iz = 1.0 / sd(dx), 1.0 / sd(dy), 1.0 / sd(dz)

        stack = jnp.zeros((R, stack_depth), jnp.int32)
        stack = stack.at[:, 0].set(root)
        sp = jnp.ones((R,), jnp.int32)
        best_t = jnp.full((R,), tmax0, jnp.float32)
        best_tri = jnp.full((R,), -1, jnp.int32)
        best_u = jnp.zeros((R,), jnp.float32)
        best_v = jnp.zeros((R,), jnp.float32)
        pos_iota = jnp.arange(stack_depth, dtype=jnp.int32)[None, :]

        def body(state):
            stack, sp, best_t, best_tri, best_u, best_v = state
            active = sp > 0
            spm = jnp.maximum(sp - 1, 0)
            ref = jnp.take_along_axis(stack, spm[:, None], axis=1)[:, 0]
            sp = jnp.where(active, spm, sp)

            is_int = active & (ref >= 0)
            is_leaf = active & (ref <= -2)

            # ---- internal: test 4 child boxes ----
            nrec = node_rec[jnp.where(is_int, ref, 0)]  # (R, 32)
            nt = nrec.T  # (32, R)
            crefs = jax.lax.bitcast_convert_type(nrec[:, 24:28], jnp.int32)
            push_count = jnp.zeros((R,), jnp.int32)
            new_stack = stack
            new_sp = sp
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
                    jnp.maximum(jnp.minimum(t0z, t1z), 1e-4))
                tfar = jnp.minimum(
                    jnp.minimum(jnp.maximum(t0x, t1x), jnp.maximum(t0y, t1y)),
                    jnp.minimum(jnp.maximum(t0z, t1z), best_t)) * 1.00000024
                hit_k = is_int & (crefs[:, k] != -1) & (tnear <= tfar)
                mask = hit_k[:, None] & (pos_iota == new_sp[:, None])
                new_stack = jnp.where(mask, crefs[:, k:k + 1], new_stack)
                new_sp = new_sp + hit_k.astype(jnp.int32)

            # ---- leaf: Moller on LS tris, SoA ----
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
                    & (u + v <= 1) & (tt >= 1e-4) & (tt <= best_t)
                    & (ids[:, k] >= 0))
                best_t = jnp.where(hit_k, tt, best_t)
                best_tri = jnp.where(hit_k, ids[:, k], best_tri)
                best_u = jnp.where(hit_k, u, best_u)
                best_v = jnp.where(hit_k, v, best_v)

            return new_stack, new_sp, best_t, best_tri, best_u, best_v

        def cond(state):
            return jnp.any(state[1] > 0)

        state = (stack, sp, best_t, best_tri, best_u, best_v)
        stack, sp, best_t, best_tri, best_u, best_v = jax.lax.while_loop(
            cond, body, state)
        return {
            "hit": best_tri >= 0,
            "dist": best_t,
            "tri": best_tri,
            "uv": jnp.stack([best_u, best_v], axis=-1),
        }

    return isect


if __name__ == "__main__" or True:
    pass
