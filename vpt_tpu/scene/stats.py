"""Scene statistics & validation (scene_stats / scene_validation parity,
/root/reference/libs/yocto/yocto_scene.{h:389-392,cpp:692-780}).

The reference library ships these utilities but its app never calls them;
here they back the CLI's --stats/--validate flags and the save-side sanity
checks.
"""

from __future__ import annotations

import numpy as np


def _fmt(num: int) -> str:
    return f"{num:>20,}".replace(",", ",")


def _count(items, get) -> int:
    total = 0
    for it in items:
        v = get(it)
        total += 0 if v is None else len(v)
    return total


def compute_bounds(scene):
    lo = np.full(3, np.inf, np.float32)
    hi = np.full(3, -np.inf, np.float32)
    for inst in scene.instances:
        sh = scene.shapes[inst.shape]
        if sh.positions is None or len(sh.positions) == 0:
            continue
        fr = np.asarray(inst.frame, np.float32)
        p = np.asarray(sh.positions, np.float32) @ fr[:3] + fr[3]
        lo = np.minimum(lo, p.min(0))
        hi = np.maximum(hi, p.max(0))
    if not np.isfinite(lo).all():
        lo = np.zeros(3, np.float32)
        hi = np.zeros(3, np.float32)
    return lo, hi


def compute_memory(scene) -> int:
    total = 0
    for sh in scene.shapes:
        for arr in (sh.positions, sh.normals, sh.texcoords, sh.colors,
                    sh.radius, sh.triangles, sh.quads, sh.lines, sh.points):
            if arr is not None:
                total += np.asarray(arr).nbytes
    for t in scene.textures:
        if t.pixels is not None:
            total += np.asarray(t.pixels).nbytes
    for v in scene.volumes:
        if v.values is not None:
            total += np.asarray(v.values).nbytes
    return total


def scene_stats(scene, verbose: bool = False) -> list[str]:
    """Row-per-quantity summary (reference scene_stats layout,
    yocto_scene.cpp:692-760, plus our volumetric extension rows)."""
    lo, hi = compute_bounds(scene)
    stats = [
        "cameras:      " + _fmt(len(scene.cameras)),
        "instances:    " + _fmt(len(scene.instances)),
        "materials:    " + _fmt(len(scene.materials)),
        "shapes:       " + _fmt(len(scene.shapes)),
        "subdivs:      " + _fmt(len(scene.subdivs)),
        "environments: " + _fmt(len(scene.environments)),
        "textures:     " + _fmt(len(scene.textures)),
        "volumes:      " + _fmt(len(scene.volumes)),
        "vol_instances:" + _fmt(len(scene.vol_instances)),
        "sdfs:         " + _fmt(len(scene.sdfs)),
        "memory:       " + _fmt(compute_memory(scene)),
        "points:       " + _fmt(_count(scene.shapes, lambda s: s.points)),
        "lines:        " + _fmt(_count(scene.shapes, lambda s: s.lines)),
        "triangles:    " + _fmt(_count(scene.shapes, lambda s: s.triangles)),
        "quads:        " + _fmt(_count(scene.shapes, lambda s: s.quads)),
        "fvquads:      " + _fmt(_count(scene.subdivs, lambda s: s.quadspos)),
        "texels:       " + _fmt(sum(
            (t.width * t.height) for t in scene.textures)),
        "voxels:       " + _fmt(sum(
            int(np.prod(v.whd)) for v in scene.volumes
            if v.whd is not None)),
        "center:       " + " ".join(f"{x:14.6g}" for x in (lo + hi) / 2),
        "size:         " + " ".join(f"{x:14.6g}" for x in (hi - lo)),
    ]
    return stats


def scene_validation(scene, notextures: bool = False) -> list[str]:
    """Empty/duplicate-name and empty-texture checks
    (yocto_scene.cpp:763-800)."""
    errs: list[str] = []

    def check_names(items, base):
        used = {}
        for it in items:
            used[it.name] = used.get(it.name, 0) + 1
        for name, n in used.items():
            if not name:
                errs.append(f"empty {base} name")
            elif n > 1:
                errs.append(f"duplicated {base} name {name}")

    check_names(scene.cameras, "camera")
    check_names(scene.shapes, "shape")
    check_names(scene.materials, "material")
    check_names(scene.instances, "instance")
    check_names(scene.textures, "texture")
    check_names(scene.environments, "environment")
    if not notextures:
        for t in scene.textures:
            if t.pixels is None or t.pixels.size == 0:
                errs.append(f"empty texture {t.name}")
    for inst in scene.instances:
        if not (0 <= inst.shape < len(scene.shapes)):
            errs.append(f"instance {inst.name}: invalid shape {inst.shape}")
        if inst.material >= len(scene.materials):
            errs.append(
                f"instance {inst.name}: invalid material {inst.material}")
    return errs
