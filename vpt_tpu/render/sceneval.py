"""Hit-point evaluation on the flattened device scene.

Batched equivalents of the reference instance-eval layer
(/root/reference/libs/yocto/yocto_scene.cpp:279-651): interpolated
position/normal/texcoord/color, tangent-frame normal mapping, textured
material evaluation (roughness squaring + clamping rules, density
derivation), and environment lookups. All functions take the flattened
SceneArrays pytree (jnp leaves) and batched hit records (tri, uv).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..core.vecmath import (
    cross,
    dot,
    frame_inverse,
    interpolate_triangle,
    normalize,
    orthonormalize,
    transform_direction,
)
from ..ops.bsdf import (
    GLOSSY,
    GLTFPBR,
    MATTE,
    MIN_ROUGHNESS,
    REFRACTIVE,
    SUBSURFACE,
    VOLUMETRIC,
    MaterialPoint,
)
from ..ops.texture import eval_texture, eval_texture_meta

PIF = jnp.pi

# texture-slot names a material can bind; integrators pass the statically
# known subset for the scene so unbound slots skip their atlas gathers
ALL_TEX_SLOTS = frozenset(
    ("emission", "color", "roughness", "scattering", "normal"))

# material tables switch from per-field gathers to one-hot matmuls below
# this material count: the (R, M) one-hot contraction runs on the MXU in
# microseconds AND its transpose (the backward pass) is a matmul instead of
# the 54k-row scatter-adds that dominated the round-3 backward scan
MAX_ONEHOT_MATS = 64

# mat_tex_meta slot order (scene/flatten.py)
_SLOT_IDX = {"emission": 0, "color": 1, "roughness": 2, "scattering": 3,
             "normal": 4}


def _use_wide(ds) -> bool:
    return getattr(ds, "tri_wide", None) is not None


def _wide_row(ds, tri):
    """One (T, 25) gather carrying positions+normals+texcoords+mat id;
    XLA CSEs the identical take across eval_* calls in a bounce."""
    return jnp.take(ds.tri_wide, tri, axis=0, mode="clip")


def _tri_verts(ds, tri):
    if _use_wide(ds):
        row = _wide_row(ds, tri)
        return row[..., 0:3], row[..., 3:6], row[..., 6:9]
    v = ds.tri_pos[tri]  # (..., 3, 3)
    return v[..., 0, :], v[..., 1, :], v[..., 2, :]


def _tri_attrs(ds, tri):
    """Everything a hit needs in one gather (two when the scene has vertex
    colors): returns (mat_id, normals (..,3,3), texcoords (..,3,2),
    colors (..,3,4))."""
    if _use_wide(ds):
        row = _wide_row(ds, tri)
        n = row[..., 9:18].reshape(row.shape[:-1] + (3, 3))
        t = row[..., 18:24].reshape(row.shape[:-1] + (3, 2))
        mat_id = jnp.round(row[..., 24]).astype(jnp.int32)
        if getattr(ds, "tri_colw", None) is not None:
            c = jnp.take(ds.tri_colw, tri, axis=0, mode="clip").reshape(
                row.shape[:-1] + (3, 4))
        else:  # statically colorless scene: no gather at all
            c = jnp.ones(row.shape[:-1] + (3, 4), row.dtype)
        return mat_id, n, t, c
    meta = ds.tri_meta[tri]           # (..., 4)
    vidx = meta[..., :3]
    mat_id = meta[..., 3]
    va = ds.vert_attr[vidx]           # (..., 3, 9)
    return mat_id, va[..., 0:3], va[..., 3:5], va[..., 5:9]


def _use_onehot(ds) -> bool:
    return (int(ds.mat_type.shape[0]) <= MAX_ONEHOT_MATS
            and getattr(ds, "mat_tex_meta", None) is not None)


def _mat_onehot(ds, mat_id):
    M = int(ds.mat_type.shape[0])
    return (mat_id[..., None] == jnp.arange(M, dtype=mat_id.dtype)).astype(
        jnp.float32)


def _oh_dot(oh, table):
    """One-hot contraction at HIGHEST precision: TPU matmuls default to
    bfloat16 operand truncation (8 mantissa bits), which would silently
    quantize material scalars and corrupt the integer-valued texture
    metadata (offset halves up to 65535, widths/heights) on scenes whose
    values are not bf16-representable. HIGHEST forces the 3-pass f32
    decomposition — exact for these magnitudes and negligible at M<=64."""
    return jnp.matmul(oh, table, precision=jax.lax.Precision.HIGHEST)


def _slot_meta(ds, oh, slot: str):
    """Per-ray texture metadata for a material slot via the one-hot matmul:
    returns (off, w, h, linear) with off < 0 marking unbound."""
    s = _SLOT_IDX[slot]
    m = _oh_dot(oh, ds.mat_tex_meta[:, s * 5:(s + 1) * 5])
    off = (jnp.round(m[..., 0]).astype(jnp.int32) * 65536
           + jnp.round(m[..., 1]).astype(jnp.int32))
    w = jnp.round(m[..., 2]).astype(jnp.int32)
    h = jnp.round(m[..., 3]).astype(jnp.int32)
    lin = m[..., 4] > 0.5
    return off, w, h, lin


def eval_position(ds, tri, uv):
    p0, p1, p2 = _tri_verts(ds, tri)
    return interpolate_triangle(p0, p1, p2, uv)


def eval_element_normal(ds, tri):
    p0, p1, p2 = _tri_verts(ds, tri)
    return normalize(cross(p1 - p0, p2 - p0))


def eval_normal(ds, tri, uv):
    """Interpolated vertex normal; geometric normal when the shape has none
    (stored as zero vectors at flatten time)."""
    _, n, _, _ = _tri_attrs(ds, tri)
    ni = interpolate_triangle(n[..., 0, :], n[..., 1, :], n[..., 2, :], uv)
    has = jnp.sum(ni * ni, axis=-1) > 1e-12
    geom = eval_element_normal(ds, tri)
    return jnp.where(has[..., None], normalize(ni), geom)


def eval_texcoord(ds, tri, uv):
    _, _, t, _ = _tri_attrs(ds, tri)
    return interpolate_triangle(t[..., 0, :], t[..., 1, :], t[..., 2, :], uv)


def eval_color(ds, tri, uv):
    _, _, _, c = _tri_attrs(ds, tri)
    return interpolate_triangle(c[..., 0, :], c[..., 1, :], c[..., 2, :], uv)


def _triangle_tangents_fromuv(p0, p1, p2, uv0, uv1, uv2):
    """yocto triangle_tangents_fromuv (yocto_geometry.h): solve the 2x2 uv
    system; fall back to axes on degenerate parametrizations."""
    p = p1 - p0
    q = p2 - p0
    s = jnp.stack([uv1[..., 0] - uv0[..., 0], uv2[..., 0] - uv0[..., 0]], axis=-1)
    t = jnp.stack([uv1[..., 1] - uv0[..., 1], uv2[..., 1] - uv0[..., 1]], axis=-1)
    div = s[..., 0] * t[..., 1] - s[..., 1] * t[..., 0]
    ok = div != 0.0
    inv = 1.0 / jnp.where(ok, div, 1.0)
    tu = (t[..., 1:2] * p - t[..., 0:1] * q) * inv[..., None]
    tv = (s[..., 0:1] * q - s[..., 1:2] * p) * inv[..., None]
    tu = jnp.where(ok[..., None], tu, jnp.array([1.0, 0.0, 0.0]))
    tv = jnp.where(ok[..., None], tv, jnp.array([0.0, 1.0, 0.0]))
    return tu, tv


def eval_shading_normal(ds, tri, uv, outgoing, tex_slots=ALL_TEX_SLOTS):
    """yocto_scene.cpp:476-503 for triangle shapes: vertex normal, normal map
    if present, refractive keeps orientation, others face-forward."""
    normal = eval_normal(ds, tri, uv)
    mat_id = _tri_attrs(ds, tri)[0]
    use_oh = _use_onehot(ds)
    oh = _mat_onehot(ds, mat_id) if use_oh else None
    if "normal" in tex_slots:
        texcoord = eval_texcoord(ds, tri, uv)
        if use_oh:
            off, w, h, lin = _slot_meta(ds, oh, "normal")
            has_nm = off >= 0
            nm_rgba = eval_texture_meta(
                ds.tex_pixels, getattr(ds, "tex_pixels_pair", None),
                off, w, h, lin, texcoord, as_linear=False)
        else:
            normal_tex = ds.mat_normal_tex[mat_id]
            has_nm = normal_tex >= 0
            nm_rgba = eval_texture(
                ds.tex_pixels, ds.tex_offset, ds.tex_width, ds.tex_height,
                ds.tex_linear, normal_tex, texcoord, as_linear=False,
            )
        normalmap = -1.0 + 2.0 * nm_rgba[..., :3]
        p0, p1, p2 = _tri_verts(ds, tri)
        tc = _tri_attrs(ds, tri)[2]
        tu, tv = _triangle_tangents_fromuv(
            p0, p1, p2, tc[..., 0, :], tc[..., 1, :], tc[..., 2, :]
        )
        fz = normal
        fx = orthonormalize(tu, fz)
        fy = normalize(cross(fz, fx))
        flip_v = dot(fy, tv) < 0.0
        nm_y = normalmap[..., 1] * jnp.where(flip_v, 1.0, -1.0)
        nm = jnp.stack([normalmap[..., 0], nm_y, normalmap[..., 2]], axis=-1)
        mapped = normalize(
            nm[..., 0:1] * fx + nm[..., 1:2] * fy + nm[..., 2:3] * fz
        )
        normal = jnp.where(has_nm[..., None], mapped, normal)

    if use_oh:
        is_refr = _oh_dot(
            oh, (ds.mat_type == REFRACTIVE).astype(jnp.float32)) > 0.5
    else:
        is_refr = ds.mat_type[mat_id] == REFRACTIVE
    forward = jnp.where((dot(normal, outgoing) >= 0.0)[..., None], normal, -normal)
    return jnp.where(is_refr[..., None], normal, forward)


def eval_material(ds, tri, uv, tex_slots=ALL_TEX_SLOTS) -> MaterialPoint:
    """yocto_scene.cpp:529-579 (textured variant)."""
    mat_id = _tri_attrs(ds, tri)[0]
    texcoord = eval_texcoord(ds, tri, uv)
    color_shp = eval_color(ds, tri, uv)
    return _material_from(ds, mat_id, texcoord, color_shp, tex_slots)


_SLOT_IDS = {
    "emission": "mat_emission_tex", "color": "mat_color_tex",
    "roughness": "mat_roughness_tex", "scattering": "mat_scattering_tex",
    "normal": "mat_normal_tex"}


def _material_from(ds, mat_id, texcoord, color_shp,
                   tex_slots=ALL_TEX_SLOTS) -> MaterialPoint:
    if _use_onehot(ds):
        # one-hot matmul material eval: one (R, M) contraction feeds every
        # field (forward: MXU microseconds instead of ~15 row gathers;
        # backward: transposed matmul instead of 54k-row scatter-adds)
        oh = _mat_onehot(ds, mat_id)
        g1 = lambda a: _oh_dot(oh, a.astype(jnp.float32))
        mtype = jnp.round(g1(ds.mat_type)).astype(jnp.int32)

        def tex(slot, as_linear):
            if slot not in tex_slots:  # static: no material binds this slot
                return None
            off, w, h, lin = _slot_meta(ds, oh, slot)
            return eval_texture_meta(
                ds.tex_pixels, getattr(ds, "tex_pixels_pair", None),
                off, w, h, lin, texcoord, as_linear)
    else:
        g1 = lambda a: a[mat_id]
        mtype = ds.mat_type[mat_id]

        def tex(slot, as_linear):
            if slot not in tex_slots:
                return None
            tid = getattr(ds, _SLOT_IDS[slot])[mat_id]
            return eval_texture(
                ds.tex_pixels, ds.tex_offset, ds.tex_width, ds.tex_height,
                ds.tex_linear, tid, texcoord, as_linear=as_linear,
            )

    emission_tex = tex("emission", True)
    color_tex = tex("color", True)
    roughness_tex = tex("roughness", False)
    scattering_tex = tex("scattering", True)

    def mul(base, t, ch):
        return base if t is None else base * t[..., ch]

    emission = mul(g1(ds.mat_emission), emission_tex, slice(0, 3))
    color = mul(g1(ds.mat_color), color_tex, slice(0, 3)) * color_shp[..., :3]
    opacity = mul(g1(ds.mat_opacity), color_tex, 3) * color_shp[..., 3]
    metallic = mul(g1(ds.mat_metallic), roughness_tex, 2)
    roughness = mul(g1(ds.mat_roughness), roughness_tex, 1)
    roughness = roughness * roughness
    ior = g1(ds.mat_ior)
    scattering = mul(g1(ds.mat_scattering), scattering_tex, slice(0, 3))
    scanisotropy = g1(ds.mat_scanisotropy)
    trdepth = g1(ds.mat_trdepth)

    volumetric_like = (
        (mtype == REFRACTIVE) | (mtype == VOLUMETRIC) | (mtype == SUBSURFACE)
    )
    # double-where: non-volumetric materials have trdepth 0, and the
    # unselected branch would compute log(1)/0 = NaN — harmless in the
    # primal (masked) but its VJP poisons EVERY mat_color row through the
    # one-hot matmul (0-cotangent x NaN-partial = NaN). The denominator
    # must be sanitized before the division happens.
    safe_tr = jnp.where(volumetric_like, trdepth, 1.0)[..., None]
    density = jnp.where(
        volumetric_like[..., None],
        -jnp.log(jnp.clip(color, 1e-4, 1.0)) / safe_tr,
        0.0,
    )

    clamped = (mtype == MATTE) | (mtype == GLTFPBR) | (mtype == GLOSSY)
    roughness = jnp.where(
        clamped,
        jnp.clip(roughness, MIN_ROUGHNESS, 1.0),
        jnp.where(
            mtype == VOLUMETRIC,
            0.0,
            jnp.where(roughness < MIN_ROUGHNESS, 0.0, roughness),
        ),
    )

    return MaterialPoint(
        mtype=mtype, emission=emission, color=color, opacity=opacity,
        roughness=roughness, metallic=metallic, ior=ior, density=density,
        scattering=scattering, scanisotropy=scanisotropy, trdepth=trdepth,
    )


# ---------------------------------------------------------------------------
# kind-aware hit evaluation (triangles + line/point primitives,
# yocto_scene.cpp:460-503). When the scene has no lines/points (static
# check on the flattened arrays) these reduce to the triangle paths.
# ---------------------------------------------------------------------------

def _has_lp(ds):
    return int(ds.line_p.shape[0]) > 0 or int(ds.point_p.shape[0]) > 0


def _lerp_line(a, b, s):
    return a * (1.0 - s[..., None]) + b * s[..., None]


def _kind_select(ds, isect, tri_val, line_fn, point_fn):
    kind = isect["kind"]
    prim = jnp.maximum(isect["prim"], 0)
    out = tri_val
    if int(ds.line_p.shape[0]) > 0:
        out = jnp.where((kind == 1)[..., None], line_fn(prim), out)
    if int(ds.point_p.shape[0]) > 0:
        out = jnp.where((kind == 2)[..., None], point_fn(prim), out)
    return out


def eval_hit_position(ds, isect, ray_o, ray_d):
    tri = jnp.maximum(isect["tri"], 0)
    pos = eval_position(ds, tri, isect["uv"])
    if not _has_lp(ds):
        return pos
    s = isect["uv"][..., 0]
    return _kind_select(
        ds, isect, pos,
        lambda p: _lerp_line(ds.line_p[p, 0], ds.line_p[p, 1], s),
        lambda p: ds.point_p[p])


def eval_hit_shading_normal(ds, isect, outgoing, tex_slots=ALL_TEX_SLOTS):
    tri = jnp.maximum(isect["tri"], 0)
    n = eval_shading_normal(ds, tri, isect["uv"], outgoing, tex_slots)
    if not _has_lp(ds):
        return n

    def line_normal(p):
        s = isect["uv"][..., 0]
        nv = _lerp_line(ds.line_n[p, 0], ds.line_n[p, 1], s)
        has = (jnp.sum(nv * nv, axis=-1) > 1e-12)[..., None]
        tangent = normalize(ds.line_p[p, 1] - ds.line_p[p, 0])
        t = jnp.where(has, normalize(nv), tangent)
        # lines: orthonormalize(outgoing, tangent) (yocto_scene.cpp:491)
        return orthonormalize(outgoing, t)

    return _kind_select(ds, isect, n, line_normal, lambda p: ds.point_n[p])


def eval_hit_texcoord(ds, isect):
    tri = jnp.maximum(isect["tri"], 0)
    tc = eval_texcoord(ds, tri, isect["uv"])
    if not _has_lp(ds):
        return tc
    s = isect["uv"][..., 0]
    return _kind_select(
        ds, isect, tc,
        lambda p: _lerp_line(ds.line_tc[p, 0], ds.line_tc[p, 1], s),
        lambda p: ds.point_tc[p])


def eval_hit_material(ds, isect, tex_slots=ALL_TEX_SLOTS) -> MaterialPoint:
    tri = jnp.maximum(isect["tri"], 0)
    if not _has_lp(ds):
        return eval_material(ds, tri, isect["uv"], tex_slots)
    s = isect["uv"][..., 0]
    mat_id = _tri_attrs(ds, tri)[0]
    texcoord = eval_texcoord(ds, tri, isect["uv"])
    color_shp = eval_color(ds, tri, isect["uv"])
    kind = isect["kind"]
    prim = jnp.maximum(isect["prim"], 0)
    if int(ds.line_p.shape[0]) > 0:
        sel = kind == 1
        mat_id = jnp.where(sel, ds.line_mat[prim], mat_id)
        texcoord = jnp.where(
            sel[..., None], _lerp_line(ds.line_tc[prim, 0], ds.line_tc[prim, 1], s),
            texcoord)
        color_shp = jnp.where(
            sel[..., None], _lerp_line(ds.line_col[prim, 0], ds.line_col[prim, 1], s),
            color_shp)
    if int(ds.point_p.shape[0]) > 0:
        sel = kind == 2
        mat_id = jnp.where(sel, ds.point_mat[prim], mat_id)
        texcoord = jnp.where(sel[..., None], ds.point_tc[prim], texcoord)
        color_shp = jnp.where(sel[..., None], ds.point_col[prim], color_shp)
    return _material_from(ds, mat_id, texcoord, color_shp, tex_slots)


def eval_environment(ds, direction, n_envs: int, env_meta=None):
    """Sum of all environments (yocto_scene.cpp:634-651). n_envs is static.

    env_meta: optional per-env static metadata [(off, w, h, linear) | None]
    computed host-side (renderer) — the environment's texture id is known at
    trace time, so its metadata lookups fold into constants and the
    pair-packed atlas halves the bilinear taps."""
    total = jnp.zeros(direction.shape[:-1] + (3,), direction.dtype)
    for e in range(n_envs):
        frame = ds.env_frame[e]
        wl = transform_direction(frame_inverse(frame), direction)
        # texcoords feed BILINEAR taps here, so direction gradients are
        # real — sanitize only the two singular inputs instead of stopping
        # the gradient: arctan2's VJP is 0/0 = NaN at the zero vector
        # (dead lanes carry direction = 0), arccos's is -1/sqrt(1-y^2) =
        # inf at the poles; both NaN-poison the whole backward pass
        wx, wz = wl[..., 0], wl[..., 2]
        deg = (jnp.abs(wx) < 1e-20) & (jnp.abs(wz) < 1e-20)
        tx = jnp.arctan2(wz, jnp.where(deg, 1.0, wx)) / (2 * PIF)
        tx = jnp.where(tx < 0, tx + 1.0, tx)
        wy = jnp.clip(wl[..., 1], -(1.0 - 1e-12), 1.0 - 1e-12)
        ty = jnp.arccos(wy) / PIF
        texcoord = jnp.stack([tx, ty], axis=-1)
        if env_meta is not None and env_meta[e] is not None:
            off, w, h, lin = env_meta[e]
            emis = eval_texture_meta(
                ds.tex_pixels, getattr(ds, "tex_pixels_pair", None),
                int(off), int(w), int(h), bool(lin), texcoord,
                as_linear=False)
        else:
            emis = eval_texture(
                ds.tex_pixels, ds.tex_offset, ds.tex_width, ds.tex_height,
                ds.tex_linear, jnp.broadcast_to(ds.env_tex[e], tx.shape),
                texcoord, as_linear=False,
            )
        total = total + ds.env_emission[e] * emis[..., :3]
    return total
