"""Flatten a HostScene into device-resident SoA arrays (the render scene).

TPU-first design decisions (vs the reference's pointer-rich scene_data):
  - Instance frames are baked into a single world-space triangle soup; one
    single-level BVH covers the whole scene (no TLAS / per-instance ray
    transforms in the hot loop). Normals use rigid-transform semantics like
    transform_normal (yocto_math.h).
  - Quads are split into triangles with the exact decomposition used by
    intersect_quad / interpolate_quad (yocto_geometry.h:822-838, 535-543), so
    hit attributes interpolate identically.
  - All textures live in one flat texel buffer with per-texture
    (offset, width, height, linear); bilinear lookup = 4 dynamic gathers.
  - Lights (emissive instances / environments / emissive analytic SDFs,
    yocto_pathtrace.cpp:983-1049) carry flattened CDF tables in one buffer.
  - Materials remain per-material arrays; a separate differentiable "params"
    pytree view is exposed for the gradient path.
"""

from __future__ import annotations

from typing import NamedTuple

import numpy as np

from ..core.vecmath import np_transform_point, np_transform_vector
from ..ops.bvh import BvhArrays, build_bvh
from ..ops.bvh_pallas import PallasBvh, from_bvh_arrays
from .schema import HostScene


LIGHT_BVH_THRESHOLD = 64


class SceneArrays(NamedTuple):
    # geometry (permuted into BVH leaf order)
    tri_pos: np.ndarray       # (T, 3, 3) world-space positions
    tri_vidx: np.ndarray      # (T, 3) into vertex attribute arrays
    tri_mat: np.ndarray       # (T,)
    tri_inst: np.ndarray      # (T,)
    vert_normal: np.ndarray   # (V, 3) world-space
    vert_texcoord: np.ndarray # (V, 2)
    vert_color: np.ndarray    # (V, 4)
    # interleaved copy [normal | texcoord | color]: hit evaluation gathers
    # ONE (V, 9) row per corner instead of three separate table gathers —
    # TPU gathers cost ~per-index regardless of row width (PERF.md §2)
    vert_attr: np.ndarray     # (V, 9)
    # [v0, v1, v2, mat] — folds the per-triangle material id into the same
    # gather as the vertex indices
    tri_meta: np.ndarray      # (T, 4) int32
    # bvh (same tree in two layouts: fused records for the XLA traversal,
    # 128-lane packed rows for the Pallas packet kernel)
    bvh: BvhArrays
    bvh_packed: "PallasBvh"
    # materials
    mat_type: np.ndarray      # (M,)
    mat_emission: np.ndarray  # (M, 3)
    mat_color: np.ndarray     # (M, 3)
    mat_roughness: np.ndarray # (M,)
    mat_metallic: np.ndarray
    mat_ior: np.ndarray
    mat_scattering: np.ndarray  # (M, 3)
    mat_scanisotropy: np.ndarray
    mat_trdepth: np.ndarray
    mat_opacity: np.ndarray
    mat_emission_tex: np.ndarray  # (M,) int32
    mat_color_tex: np.ndarray
    mat_roughness_tex: np.ndarray
    mat_scattering_tex: np.ndarray
    mat_normal_tex: np.ndarray
    # textures
    tex_pixels: np.ndarray    # (P, 4) float32 raw
    tex_offset: np.ndarray    # (K,)
    tex_width: np.ndarray
    tex_height: np.ndarray
    tex_linear: np.ndarray    # (K,) int32 (1 = already linear / float source)
    # environments
    env_frame: np.ndarray     # (E, 4, 3)
    env_emission: np.ndarray  # (E, 3)
    env_tex: np.ndarray       # (E,)
    # lights
    light_kind: np.ndarray        # (L,) 0=instance 1=environment 2=sdf
    light_id: np.ndarray          # (L,) instance / environment / sdf index
    light_tri_offset: np.ndarray  # (L,) first triangle (instance lights)
    light_tri_count: np.ndarray   # (L,)
    light_cdf_offset: np.ndarray  # (L,) into light_cdf
    light_cdf_count: np.ndarray   # (L,)
    light_total: np.ndarray       # (L,) cdf totals (area / luminance sum)
    light_cdf: np.ndarray         # (sum,) flattened inclusive prefix sums
    light_alias_idx: np.ndarray   # (sum,) Walker alias redirect per entry
    light_alias_cut: np.ndarray   # (sum,) keep-probability per entry
    light_tris: np.ndarray        # (LT, 3, 3) light triangle positions (orig order)
    light_tri_vidx: np.ndarray    # (LT, 3)
    light_tri_light: np.ndarray   # (LT,) owning light index
    # per-light BVHs for mesh emitters above LIGHT_BVH_THRESHOLD triangles:
    # the bounded all-hits pdf walk (ops/bvh.py light_pdf_bvh) replaces the
    # O(rays x triangles) sweep for large emissive meshes
    light_bvh_slot: np.ndarray    # (L,) int32, -1 = use the exact sweep
    light_bvhs: tuple             # tuple[BvhArrays]
    # volumes / sdfs
    grid_values: np.ndarray   # (G, D, H, W) float32 (padded to max dims)
    grid_whd: np.ndarray      # (G, 3) int32 true dims
    grid_res: np.ndarray      # (G,)
    vi_frame: np.ndarray      # (VI, 4, 3)
    vi_volume: np.ndarray     # (VI,)
    vi_material: np.ndarray
    vi_scalef: np.ndarray
    sdf_type: np.ndarray      # (S,)
    sdf_params: np.ndarray    # (S, 4)
    sdf_whd: np.ndarray       # (S, 3)
    sdf_frame: np.ndarray     # (S, 4, 3)
    sdf_material: np.ndarray  # (S,)
    # line / point primitives (yocto_geometry.h:683-747; shading semantics
    # yocto_scene.cpp:476-503). Kept out of the triangle BVH: scenes with
    # them are tested brute-force after the BVH pass and merged by min-t;
    # when absent (all reference test scenes) the arrays are empty and the
    # extra pass is statically skipped.
    line_p: np.ndarray        # (Ln, 2, 3) world endpoints
    line_r: np.ndarray        # (Ln, 2) radii
    line_n: np.ndarray        # (Ln, 2, 3) world vertex normals (zero = tangent)
    line_tc: np.ndarray       # (Ln, 2, 2)
    line_col: np.ndarray      # (Ln, 2, 4)
    line_mat: np.ndarray      # (Ln,)
    point_p: np.ndarray       # (Pn, 3)
    point_r: np.ndarray       # (Pn,)
    point_n: np.ndarray       # (Pn, 3) world sphere-hack normal (frame z)
    point_tc: np.ndarray      # (Pn, 2)
    point_col: np.ndarray     # (Pn, 4)
    point_mat: np.ndarray     # (Pn,)
    # cameras
    cam_frame: np.ndarray     # (C, 4, 3)
    cam_lens: np.ndarray
    cam_film: np.ndarray
    cam_aspect: np.ndarray
    cam_focus: np.ndarray
    cam_aperture: np.ndarray
    cam_ortho: np.ndarray     # (C,) int32
    # ---- round-4 hot-path layouts (gather-count reduction, PERF.md §2:
    # a 54k-row gather costs ~1 ms regardless of table size or row width,
    # so the shading body's cost is ~the NUMBER of gathers) ----
    # one row per triangle: [pos0..2 (9) | n0..2 (9) | tc0..2 (6) | mat (1)]
    # -> ONE gather replaces tri_pos + vert_attr x3 corners + tri_meta.
    # None when the scene exceeds the memory gate (falls back to the
    # per-vertex tables above).
    tri_wide: np.ndarray | None = None      # (T, 25) f32
    # per-triangle corner colors, built only when any vertex color != 1
    # (scenes without vertex colors skip the gather statically)
    tri_colw: np.ndarray | None = None      # (T, 12) f32
    # pair-packed texel atlas: row (y*w+x) = [texel(x), texel((x+1)%w)] ->
    # bilinear needs 2 gathers (rows y, y+1) instead of 4 taps
    tex_pixels_pair: np.ndarray | None = None   # (P, 8) f32
    # per-material texture metadata for one-hot-matmul material eval:
    # 5 slots (emission,color,roughness,scattering,normal) x
    # [off_hi, off_lo, width, height, linear] (f32; off = hi*65536+lo,
    # exact for atlas offsets < 2^40; off_lo = -1 marks unbound)
    mat_tex_meta: np.ndarray | None = None  # (M, 25) f32
    # alias tables packed [cut, idx-as-f32] -> one gather per draw
    light_alias_pack: np.ndarray | None = None  # (sum, 2) f32
    # per-entry probability weight/total (env pdf: one gather replaces the
    # cdf hi/lo pair)
    light_pdf_prob: np.ndarray | None = None    # (sum,) f32
    # scene bounds for traversal ray-sort keys
    scene_bb: np.ndarray | None = None          # (2, 3) f32
    # ---- round-5 SDF acceleration metadata ----
    # margin-inflated world AABBs of every grid instance's bbox and every
    # analytic sdf's support (unbounded types use +-1e30): used for the
    # sphere tracers' exact escape short-circuit (a ray with no AABB ahead
    # provably escapes) and, for vi, the K-tap selection (ops/sdf.py)
    vi_aabb: np.ndarray | None = None           # (VI, 6) [lo|hi]
    sdf_aabb: np.ndarray | None = None          # (S, 6) [lo|hi]
    # static overlap bound marker: no point can satisfy the grid-tap
    # "inside" criterion for more than K = vi_tap_cap.shape[0] instances
    # simultaneously (conservative AABB-intersection count at flatten
    # time), so eval_sdf_scene gathers K cell rows instead of VI
    vi_tap_cap: np.ndarray | None = None        # (K,) i32 zeros
    # differentiable (N_cells, 8) corner-row table — attached in-program
    # by ops.sdf.attach_cell_rows (never stored at flatten time)
    grid_cell_rows: np.ndarray | None = None


def _quads_to_tris_idx(quads):
    t1 = quads[:, [0, 1, 3]]
    t2 = quads[:, [2, 3, 1]]
    keep2 = quads[:, 2] != quads[:, 3]
    return np.concatenate([t1, t2[keep2]], axis=0).astype(np.int64)


def flatten_scene(scene: HostScene) -> SceneArrays:
    f32, i32 = np.float32, np.int32

    # ---------------- geometry ----------------
    tri_pos_l, tri_vidx_l, tri_mat_l, tri_inst_l = [], [], [], []
    vn_l, vt_l, vc_l = [], [], []
    ln_p, ln_r, ln_n, ln_tc, ln_col, ln_mat = [], [], [], [], [], []
    pt_p, pt_r, pt_n, pt_tc, pt_col, pt_mat = [], [], [], [], [], []
    vert_base = 0
    inst_tri_range = {}
    for ii, inst in enumerate(scene.instances):
        shape = scene.shapes[inst.shape]
        if shape.positions is None:
            continue
        # line/point primitives go into their own brute-force tables
        if (shape.lines is not None and len(shape.lines)) or (
                shape.points is not None and len(shape.points)):
            wpos_lp = np_transform_point(inst.frame, shape.positions).astype(f32)
            V = wpos_lp.shape[0]
            rad = (np.asarray(shape.radius, f32) if shape.radius is not None
                   else np.full(V, 1e-3, f32))
            tc = (np.asarray(shape.texcoords, f32)
                  if shape.texcoords is not None else np.zeros((V, 2), f32))
            col = (np.asarray(shape.colors, f32)
                   if shape.colors is not None else np.ones((V, 4), f32))
            if shape.normals is not None:
                wn_lp = np_transform_vector(inst.frame, shape.normals)
                wn_lp = wn_lp / np.maximum(
                    np.linalg.norm(wn_lp, axis=-1, keepdims=True), 1e-30)
            else:
                wn_lp = np.zeros((V, 3), f32)  # zero => tangent fallback
            if shape.lines is not None and len(shape.lines):
                ls = np.asarray(shape.lines, np.int64)
                ln_p.append(wpos_lp[ls])
                ln_r.append(rad[ls])
                ln_n.append(wn_lp[ls].astype(f32))
                ln_tc.append(tc[ls])
                ln_col.append(col[ls])
                ln_mat.append(np.full(ls.shape[0], inst.material, np.int64))
            if shape.points is not None and len(shape.points):
                ps = np.asarray(shape.points, np.int64)
                pt_p.append(wpos_lp[ps])
                pt_r.append(rad[ps])
                # sphere-hack normal at uv=(0,0): instance-frame z axis
                # (yocto_scene.cpp:493-497)
                fz = np.asarray(inst.frame, f32)[2]
                fz = fz / max(np.linalg.norm(fz), 1e-30)
                pt_n.append(np.tile(fz[None], (ps.shape[0], 1)))
                pt_tc.append(tc[ps])
                pt_col.append(col[ps])
                pt_mat.append(np.full(ps.shape[0], inst.material, np.int64))
        tris = []
        if shape.triangles is not None and len(shape.triangles):
            tris.append(np.asarray(shape.triangles, np.int64))
        if shape.quads is not None and len(shape.quads):
            tris.append(_quads_to_tris_idx(np.asarray(shape.quads, np.int64)))
        if not tris:
            continue
        tris = np.concatenate(tris, axis=0)
        wpos = np_transform_point(inst.frame, shape.positions).astype(f32)
        if shape.normals is not None:
            wn = np_transform_vector(inst.frame, shape.normals)
            wn = wn / np.maximum(np.linalg.norm(wn, axis=-1, keepdims=True), 1e-30)
        else:
            wn = np.zeros_like(wpos)  # flag: zero => use geometric normal
        tc = shape.texcoords if shape.texcoords is not None else np.zeros(
            (wpos.shape[0], 2), f32
        )
        col = shape.colors if shape.colors is not None else np.ones(
            (wpos.shape[0], 4), f32
        )
        t0 = sum(len(x) for x in tri_pos_l)
        inst_tri_range[ii] = (t0, tris.shape[0])
        tri_pos_l.append(wpos[tris])
        tri_vidx_l.append(tris + vert_base)
        tri_mat_l.append(np.full(tris.shape[0], inst.material, np.int64))
        tri_inst_l.append(np.full(tris.shape[0], ii, np.int64))
        vn_l.append(wn.astype(f32))
        vt_l.append(np.asarray(tc, f32))
        vc_l.append(np.asarray(col, f32))
        vert_base += wpos.shape[0]

    if tri_pos_l:
        tri_pos = np.concatenate(tri_pos_l)
        tri_vidx = np.concatenate(tri_vidx_l)
        tri_mat = np.concatenate(tri_mat_l)
        tri_inst = np.concatenate(tri_inst_l)
        vert_normal = np.concatenate(vn_l)
        vert_texcoord = np.concatenate(vt_l)
        vert_color = np.concatenate(vc_l)
    else:
        tri_pos = np.zeros((1, 3, 3), f32)
        tri_vidx = np.zeros((1, 3), np.int64)
        tri_mat = np.zeros(1, np.int64)
        tri_inst = np.zeros(1, np.int64)
        vert_normal = np.zeros((1, 3), f32)
        vert_texcoord = np.zeros((1, 2), f32)
        vert_color = np.ones((1, 4), f32)

    vert_attr = np.concatenate(
        [vert_normal, vert_texcoord, vert_color], axis=1).astype(f32)
    bvh, perm = build_bvh(tri_pos)
    if perm.size:
        tri_pos = tri_pos[perm]
        tri_vidx_p = tri_vidx[perm]
        tri_mat_p = tri_mat[perm]
        tri_inst_p = tri_inst[perm]
    else:
        tri_vidx_p, tri_mat_p, tri_inst_p = tri_vidx, tri_mat, tri_inst

    # ---------------- materials ----------------
    mats = scene.materials or []
    M = max(len(mats), 1)

    def marr(get, shape_tail=(), dtype=f32, default=0):
        out = np.full((M,) + shape_tail, default, dtype)
        for i, m in enumerate(mats):
            out[i] = get(m)
        return out

    # ---------------- textures ----------------
    tex_off, tex_w, tex_h, tex_lin, texels = [], [], [], [], []
    off = 0
    for t in scene.textures:
        tex_off.append(off)
        tex_w.append(t.width)
        tex_h.append(t.height)
        tex_lin.append(1 if t.linear else 0)
        px = t.pixels.reshape(-1, 4).astype(f32)
        texels.append(px)
        off += px.shape[0]
    tex_pixels = np.concatenate(texels) if texels else np.zeros((1, 4), f32)

    # ---------------- lights (yocto_pathtrace.cpp:983-1049) ----------------
    lk, lid, lto, ltc, lco, lcc, ltot = [], [], [], [], [], [], []
    cdf_chunks = []
    lt_pos, lt_vidx, lt_light = [], [], []
    lbvh_slot, lbvhs = [], []
    cdf_off = 0
    li = 0
    # light triangle tables use the pre-permutation (soup) order
    inv = np.argsort(perm) if perm.size else np.arange(tri_pos.shape[0])
    tri_pos_orig = tri_pos[inv] if perm.size else tri_pos
    tri_vidx_orig = tri_vidx
    for ii, inst in enumerate(scene.instances):
        mat = scene.materials[inst.material]
        if not np.any(mat.emission != 0) or ii not in inst_tri_range:
            continue
        t0, tc = inst_tri_range[ii]
        v = tri_pos_orig[t0:t0 + tc]
        areas = 0.5 * np.linalg.norm(
            np.cross(v[:, 1] - v[:, 0], v[:, 2] - v[:, 0]), axis=-1
        )
        cdf = np.cumsum(areas).astype(f32)
        cdf_chunks.append(cdf)
        lk.append(0)
        lid.append(ii)
        lto.append(t0)
        ltc.append(tc)
        lco.append(cdf_off)
        lcc.append(tc)
        ltot.append(float(cdf[-1]) if cdf.size else 0.0)
        cdf_off += cdf.size
        lt_pos.append(v)
        lt_vidx.append(tri_vidx_orig[t0:t0 + tc])
        lt_light.append(np.full(tc, li, np.int64))
        if tc > LIGHT_BVH_THRESHOLD:
            lb, _ = build_bvh(np.ascontiguousarray(v, f32))
            lbvh_slot.append(len(lbvhs))
            lbvhs.append(lb)
        else:
            lbvh_slot.append(-1)
        li += 1

    for ei, env in enumerate(scene.environments):
        if not np.any(env.emission != 0):
            continue
        lk.append(1)
        lid.append(ei)
        lto.append(0)
        ltc.append(0)
        if env.emission_tex >= 0:
            t = scene.textures[env.emission_tex]
            px = t.pixels.reshape(-1, 4)
            j = np.arange(px.shape[0]) // t.width
            th = (j + 0.5) * np.pi / t.height
            w = px[:, :3].max(axis=-1) * np.sin(th)
            cdf = np.cumsum(w).astype(f32)
            cdf_chunks.append(cdf)
            lco.append(cdf_off)
            lcc.append(cdf.size)
            ltot.append(float(cdf[-1]))
            cdf_off += cdf.size
        else:
            lco.append(cdf_off)
            lcc.append(0)
            ltot.append(0.0)
        lbvh_slot.append(-1)
        li += 1

    for si, sdf in enumerate(scene.sdfs):
        mat = scene.materials[sdf.material]
        if not np.any(mat.emission != 0):
            continue
        lk.append(2)
        lid.append(si)
        lto.append(0)
        ltc.append(0)
        area = float(sdf.whd[0] * sdf.whd[1])
        cdf_chunks.append(np.asarray([area], f32))
        lco.append(cdf_off)
        lcc.append(1)
        ltot.append(area)
        cdf_off += 1
        lbvh_slot.append(-1)
        li += 1

    L = len(lk)
    light_cdf = (
        np.concatenate([c for c in cdf_chunks if c is not None])
        if cdf_chunks else np.zeros(1, f32)
    )
    # O(1) categorical sampling tables per CDF chunk (core/alias.py): two
    # gathers on device replace the ~21-step searchsorted over the
    # environment's multi-megatexel CDF
    from ..core.alias import build_alias

    alias_idx_chunks, alias_cut_chunks = [], []
    for c in cdf_chunks:
        w = np.diff(c, prepend=np.float32(0.0))
        ai, cu = build_alias(w)
        alias_idx_chunks.append(ai)
        alias_cut_chunks.append(cu)
    light_alias_idx = (np.concatenate(alias_idx_chunks)
                       if alias_idx_chunks else np.zeros(1, i32))
    light_alias_cut = (np.concatenate(alias_cut_chunks)
                       if alias_cut_chunks else np.zeros(1, f32))
    if lt_pos:
        light_tris = np.concatenate(lt_pos)
        light_tri_vidx = np.concatenate(lt_vidx)
        light_tri_light = np.concatenate(lt_light)
    else:
        light_tris = np.zeros((1, 3, 3), f32)
        light_tri_vidx = np.zeros((1, 3), np.int64)
        light_tri_light = np.full(1, -1, np.int64)

    # ---------------- volumes / sdfs ----------------
    G = len(scene.volumes)
    if G:
        maxd = max(int(v.values.shape[0]) for v in scene.volumes)
        maxh = max(int(v.values.shape[1]) for v in scene.volumes)
        maxw = max(int(v.values.shape[2]) for v in scene.volumes)
        grid_values = np.zeros((G, maxd, maxh, maxw), f32)
        grid_whd = np.zeros((G, 3), i32)
        grid_res = np.zeros(G, f32)
        for gi, v in enumerate(scene.volumes):
            d, h, w = v.values.shape
            grid_values[gi, :d, :h, :w] = v.values
            grid_whd[gi] = v.whd
            grid_res[gi] = v.res
    else:
        grid_values = np.zeros((1, 1, 1, 1), f32)
        grid_whd = np.ones((1, 3), i32)
        grid_res = np.ones(1, f32)

    VI = len(scene.vol_instances)
    vi_frame = np.stack(
        [v.frame for v in scene.vol_instances], axis=0
    ) if VI else np.zeros((0, 4, 3), f32)
    S = len(scene.sdfs)
    sdf_frame = np.stack([s.frame for s in scene.sdfs]) if S else np.zeros((0, 4, 3), f32)

    E = len(scene.environments)

    # ---------------- round-4 hot-path layouts ----------------
    T = tri_pos.shape[0]
    tri_wide = None
    tri_colw = None
    if T <= 4_000_000:  # 4M tris -> 400 MB; beyond that use per-vertex tables
        va_c = vert_attr[tri_vidx_p]                      # (T, 3, 9)
        tri_wide = np.concatenate(
            [tri_pos.reshape(T, 9),
             va_c[:, :, 0:3].reshape(T, 9),
             va_c[:, :, 3:5].reshape(T, 6),
             tri_mat_p.astype(f32)[:, None]], axis=1).astype(f32)
        col_c = va_c[:, :, 5:9]
        if np.any(col_c != 1.0):
            tri_colw = col_c.reshape(T, 12).astype(f32)

    tex_pixels_pair = None
    if tex_pixels.shape[0] <= 32_000_000:
        pr = np.zeros((max(tex_pixels.shape[0], 1), 8), f32)
        for toff, tw, th, px in zip(tex_off, tex_w, tex_h, texels):
            a = px.reshape(th, tw, 4)
            b = np.roll(a, -1, axis=1)  # wrap: pair of x and (x+1) % w
            pr[toff:toff + th * tw] = np.concatenate([a, b], -1).reshape(-1, 8)
        tex_pixels_pair = pr

    # per-material texture metadata rows (see SceneArrays docstring)
    mat_tex_arrays = [
        marr(lambda m: m.emission_tex, dtype=i32, default=-1),
        marr(lambda m: m.color_tex, dtype=i32, default=-1),
        marr(lambda m: m.roughness_tex, dtype=i32, default=-1),
        marr(lambda m: m.scattering_tex, dtype=i32, default=-1),
        marr(lambda m: m.normal_tex, dtype=i32, default=-1),
    ]
    tex_off_a = np.asarray(tex_off, np.int64) if tex_off else np.zeros(1, np.int64)
    tex_w_a = np.asarray(tex_w, np.int64) if tex_w else np.ones(1, np.int64)
    tex_h_a = np.asarray(tex_h, np.int64) if tex_h else np.ones(1, np.int64)
    tex_lin_a = np.asarray(tex_lin, np.int64) if tex_lin else np.zeros(1, np.int64)
    mat_tex_meta = np.zeros((M, 5, 5), f32)
    mat_tex_meta[:, :, 1] = -1.0  # off_lo = -1 marks unbound
    mat_tex_meta[:, :, 2:4] = 1.0
    n_real_tex = len(scene.textures)
    for s, ids in enumerate(mat_tex_arrays):
        for mi in range(M):
            t = int(ids[mi])
            if 0 <= t < n_real_tex:
                o = int(tex_off_a[t])
                mat_tex_meta[mi, s] = [o // 65536, o % 65536,
                                       int(tex_w_a[t]), int(tex_h_a[t]),
                                       int(tex_lin_a[t])]
    mat_tex_meta = mat_tex_meta.reshape(M, 25)

    light_alias_pack = None
    if light_alias_idx.max(initial=0) < (1 << 24):
        light_alias_pack = np.stack(
            [light_alias_cut.astype(f32),
             light_alias_idx.astype(f32)], axis=1)
    if cdf_chunks:
        light_pdf_prob = np.concatenate(
            [np.diff(c, prepend=np.float32(0.0))
             / max(float(c[-1]), 1e-30) for c in cdf_chunks]).astype(f32)
    else:
        light_pdf_prob = np.zeros(1, f32)

    scene_bb = np.stack([
        tri_pos.reshape(-1, 3).min(axis=0),
        tri_pos.reshape(-1, 3).max(axis=0)]).astype(f32)

    # ---------------- round-5 SDF acceleration metadata ----------------
    # World AABBs of SDF supports + the static tap-overlap bound K.
    # Margin rigor: the grid-tap criterion is bbox_dist < flt_eps * t, and
    # while p stays within the scene region (|o|, |hit points| <= B) a
    # live march has t < ~2B before bbox_dist ~ t >> flt_eps*t, so the
    # "inside" shell never exceeds ~2*flt_eps*B; AABBs are inflated by
    # 8*flt_eps*B (>= 4x that) plus an absolute floor.
    vi_aabb = np.zeros((0, 6), f32)
    sdf_aabb = np.zeros((0, 6), f32)
    vi_tap_cap = None
    if VI or S:
        def _inv_frame(fr):
            rot = np.asarray(fr, np.float64)[:3, :]
            o = np.asarray(fr, np.float64)[3, :]
            rt = rot.T
            return rt, -o @ rt

        def _world_box(fr_w2l, lo, hi):
            rt, ot = _inv_frame(fr_w2l)
            cs = np.array([[x, y, z] for x in (lo[0], hi[0])
                           for y in (lo[1], hi[1]) for z in (lo[2], hi[2])])
            wc = cs @ rt + ot
            return np.concatenate([wc.min(0), wc.max(0)])

        boxes_vi = []
        for vii, v in enumerate(scene.vol_instances):
            g = v.volume
            bs = (grid_res[g] * grid_whd[g].astype(np.float64)
                  * float(v.scalef))
            boxes_vi.append(_world_box(vi_frame[vii], np.zeros(3), bs))
        # analytic sdf supports (types: ops/sdf.py order; unbounded -> 1e30)
        BIG = 1e30
        boxes_sdf = []
        for s in scene.sdfs:
            p4 = np.asarray(s.params, np.float64)
            if s.type == 3:      # SD_PLANE: the whole y=0 plane
                lo, hi = [-BIG, 0.0, -BIG], [BIG, 0.0, BIG]
            elif s.type == 4:    # SD_SPHERE r
                lo, hi = [-p4[0]] * 3, [p4[0]] * 3
            elif s.type == 1:    # SD_BOX spans [0, whd]
                lo, hi = [0.0] * 3, p4[:3]
            elif s.type == 0:    # SD_BBOX b, e
                b = p4[:3] + p4[3]
                lo, hi = -b, b
            elif s.type == 5:    # SD_TORUS r1, r2
                r = p4[0] + p4[1]
                lo, hi = [-r, -p4[1], -r], [r, p4[1], r]
            else:                # SD_CAPPED_CONE h, r1, r2
                r = max(p4[1], p4[2])
                lo, hi = [-r, -p4[0], -r], [r, p4[0], r]
            boxes_sdf.append(_world_box(
                sdf_frame[len(boxes_sdf)], np.asarray(lo, np.float64),
                np.asarray(hi, np.float64)))
        allb = np.asarray(boxes_vi + boxes_sdf, np.float64)
        finite = np.abs(allb) < BIG * 0.5
        cam_positions = np.stack(
            [np.asarray(c.frame)[3, :] for c in scene.cameras]
        ) if scene.cameras else np.zeros((1, 3))
        B = max(float(np.abs(np.where(finite, allb, 0.0)).max(initial=1.0)),
                float(np.abs(cam_positions).max(initial=1.0)),
                float(np.abs(scene_bb).max(initial=0.0)))
        margin = max(1e-5, 8.0 * 1.1920929e-07 * B)
        if boxes_vi:
            bv = np.asarray(boxes_vi, np.float64)
            bv[:, :3] -= margin
            bv[:, 3:] += margin
            vi_aabb = np.clip(bv, -BIG, BIG).astype(f32)
            inter = ((bv[:, None, :3] <= bv[None, :, 3:])
                     & (bv[:, None, 3:] >= bv[None, :, :3])).all(-1)
            vi_tap_cap = np.zeros(int(inter.sum(1).max(initial=1)), i32)
        if boxes_sdf:
            bs_ = np.asarray(boxes_sdf, np.float64)
            bs_[:, :3] -= margin
            bs_[:, 3:] += margin
            sdf_aabb = np.clip(bs_, -BIG, BIG).astype(f32)

    return SceneArrays(
        tri_pos=tri_pos.astype(f32),
        tri_vidx=tri_vidx_p.astype(i32),
        tri_mat=tri_mat_p.astype(i32),
        tri_meta=np.concatenate(
            [tri_vidx_p.astype(i32), tri_mat_p.astype(i32)[:, None]],
            axis=1),
        tri_inst=tri_inst_p.astype(i32),
        vert_normal=vert_normal,
        vert_texcoord=vert_texcoord,
        vert_color=vert_color,
        vert_attr=vert_attr,
        bvh=bvh,
        bvh_packed=from_bvh_arrays(bvh),
        mat_type=marr(lambda m: m.type, dtype=i32),
        mat_emission=marr(lambda m: m.emission, (3,)),
        mat_color=marr(lambda m: m.color, (3,)),
        mat_roughness=marr(lambda m: m.roughness),
        mat_metallic=marr(lambda m: m.metallic),
        mat_ior=marr(lambda m: m.ior, default=1.5),
        mat_scattering=marr(lambda m: m.scattering, (3,)),
        mat_scanisotropy=marr(lambda m: m.scanisotropy),
        mat_trdepth=marr(lambda m: m.trdepth, default=0.01),
        mat_opacity=marr(lambda m: m.opacity, default=1.0),
        mat_emission_tex=mat_tex_arrays[0],
        mat_color_tex=mat_tex_arrays[1],
        mat_roughness_tex=mat_tex_arrays[2],
        mat_scattering_tex=mat_tex_arrays[3],
        mat_normal_tex=mat_tex_arrays[4],
        tex_pixels=tex_pixels,
        tex_offset=np.asarray(tex_off, i32) if tex_off else np.zeros(1, i32),
        tex_width=np.asarray(tex_w, i32) if tex_w else np.ones(1, i32),
        tex_height=np.asarray(tex_h, i32) if tex_h else np.ones(1, i32),
        tex_linear=np.asarray(tex_lin, i32) if tex_lin else np.zeros(1, i32),
        env_frame=np.stack([e.frame for e in scene.environments]) if E else np.zeros(
            (0, 4, 3), f32
        ),
        env_emission=np.stack([e.emission for e in scene.environments]).astype(f32)
        if E else np.zeros((0, 3), f32),
        env_tex=np.asarray(
            [e.emission_tex for e in scene.environments], i32
        ) if E else np.zeros(0, i32),
        light_kind=np.asarray(lk, i32) if L else np.zeros(0, i32),
        light_id=np.asarray(lid, i32) if L else np.zeros(0, i32),
        light_tri_offset=np.asarray(lto, i32) if L else np.zeros(0, i32),
        light_tri_count=np.asarray(ltc, i32) if L else np.zeros(0, i32),
        light_cdf_offset=np.asarray(lco, i32) if L else np.zeros(0, i32),
        light_cdf_count=np.asarray(lcc, i32) if L else np.zeros(0, i32),
        light_total=np.asarray(ltot, f32) if L else np.zeros(0, f32),
        light_cdf=light_cdf,
        light_alias_idx=light_alias_idx.astype(i32),
        light_alias_cut=light_alias_cut.astype(f32),
        light_tris=light_tris.astype(f32),
        light_tri_vidx=light_tri_vidx.astype(i32),
        light_tri_light=light_tri_light.astype(i32),
        light_bvh_slot=np.asarray(lbvh_slot, i32) if L else np.zeros(0, i32),
        light_bvhs=tuple(lbvhs),
        line_p=np.concatenate(ln_p) if ln_p else np.zeros((0, 2, 3), f32),
        line_r=np.concatenate(ln_r) if ln_r else np.zeros((0, 2), f32),
        line_n=np.concatenate(ln_n) if ln_n else np.zeros((0, 2, 3), f32),
        line_tc=np.concatenate(ln_tc) if ln_tc else np.zeros((0, 2, 2), f32),
        line_col=np.concatenate(ln_col) if ln_col else np.ones((0, 2, 4), f32),
        line_mat=np.concatenate(ln_mat).astype(i32) if ln_mat else np.zeros(0, i32),
        point_p=np.concatenate(pt_p) if pt_p else np.zeros((0, 3), f32),
        point_r=np.concatenate(pt_r) if pt_r else np.zeros(0, f32),
        point_n=np.concatenate(pt_n) if pt_n else np.zeros((0, 3), f32),
        point_tc=np.concatenate(pt_tc) if pt_tc else np.zeros((0, 2), f32),
        point_col=np.concatenate(pt_col) if pt_col else np.ones((0, 4), f32),
        point_mat=np.concatenate(pt_mat).astype(i32) if pt_mat else np.zeros(0, i32),
        grid_values=grid_values,
        grid_whd=grid_whd,
        grid_res=grid_res,
        vi_frame=vi_frame.astype(f32),
        vi_volume=np.asarray([v.volume for v in scene.vol_instances], i32)
        if VI else np.zeros(0, i32),
        vi_material=np.asarray([v.material for v in scene.vol_instances], i32)
        if VI else np.zeros(0, i32),
        vi_scalef=np.asarray([v.scalef for v in scene.vol_instances], f32)
        if VI else np.zeros(0, f32),
        sdf_type=np.asarray([s.type for s in scene.sdfs], i32) if S else np.zeros(0, i32),
        sdf_params=np.stack([s.params for s in scene.sdfs]).astype(f32)
        if S else np.zeros((0, 4), f32),
        sdf_whd=np.stack([s.whd for s in scene.sdfs]).astype(f32)
        if S else np.zeros((0, 3), f32),
        sdf_frame=sdf_frame.astype(f32),
        sdf_material=np.asarray([s.material for s in scene.sdfs], i32)
        if S else np.zeros(0, i32),
        cam_frame=np.stack([c.frame for c in scene.cameras]).astype(f32),
        cam_lens=np.asarray([c.lens for c in scene.cameras], f32),
        cam_film=np.asarray([c.film for c in scene.cameras], f32),
        cam_aspect=np.asarray([c.aspect for c in scene.cameras], f32),
        cam_focus=np.asarray([c.focus for c in scene.cameras], f32),
        cam_aperture=np.asarray([c.aperture for c in scene.cameras], f32),
        cam_ortho=np.asarray(
            [1 if c.orthographic else 0 for c in scene.cameras], i32
        ),
        tri_wide=tri_wide,
        tri_colw=tri_colw,
        tex_pixels_pair=tex_pixels_pair,
        mat_tex_meta=mat_tex_meta,
        light_alias_pack=light_alias_pack,
        light_pdf_prob=light_pdf_prob,
        scene_bb=scene_bb,
        vi_aabb=vi_aabb,
        sdf_aabb=sdf_aabb,
        vi_tap_cap=vi_tap_cap,
    )
