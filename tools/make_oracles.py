"""Produce apples-to-apples reference oracles for the asset-limited scenes.

Scenes 02/04/05 reference meshes that are not checked into the reference
repo, so our loader substitutes procedural stand-ins (json_io.py). The
reference binary cannot render the original scenes at all ("file not
found"), so GOLDEN.md round-2 rows for 02/04/05 compared a stand-in against
the real-asset golden JPG — transparency, not parity. This script closes
that gap the same way round 2 did for 06/07: it exports each stand-in scene
with save_json_scene (shapes as PLY, textures as PNG/HDR, subdivs as OBJ)
and renders the EXPORT with the compiled C++ reference (/tmp/ref/bin/
ypathtrace, build recipe in goldens/README.md), giving a like-for-like
oracle for exactly the geometry both renderers see.

Also exports a nested-media scene (smoke sphere inside a glass sphere) to
pin the reference's volume-stack semantics: its vstack update is
`if (vstack.empty()) push else pop` (yocto_pathtrace.cpp:642-648), i.e.
depth is capped at 1 — which our slot+depth integrator mirrors exactly.

Outputs: goldens/standins/<scene>/ (exported scenes, checked in) and
goldens/ref<scene>_<shader>_<res>_<spp>.png (reference renders, checked in).
"""

import os
import subprocess
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REF_BIN = "/tmp/ref/bin/ypathtrace"
OUT = os.path.join(REPO, "goldens")

CONFIGS = {
    "02_rollingteapot": ("pathtrace", 360, 64, 4),
    "04_head1": ("pathtrace", 360, 64, 4),
    "05_head1ss": ("volpathtrace", 360, 64, 64),
}


def export_scene(name):
    from vpt_tpu.scene.json_io import load_json_scene
    from vpt_tpu.scene.json_save import save_json_scene

    src = f"/root/reference/tests/{name}/{name.split('_', 1)[1]}.json"
    if not os.path.exists(src):
        # scene file name == dir suffix for all reference tests except 03
        cands = [f for f in os.listdir(f"/root/reference/tests/{name}")
                 if f.endswith(".json")]
        src = f"/root/reference/tests/{name}/{cands[0]}"
    scene = load_json_scene(src)
    out_dir = os.path.join(OUT, "standins", name)
    os.makedirs(out_dir, exist_ok=True)
    out_json = os.path.join(out_dir, "scene.json")
    save_json_scene(out_json, scene)
    return out_json


def make_nested_scene():
    from vpt_tpu.scene.json_save import save_json_scene
    from vpt_tpu.scene.procedural import make_uvsphere
    from vpt_tpu.scene.schema import (
        Camera, Environment, HostScene, Instance, Material, Shape,
    )

    def lookat(eye, center, up=(0, 1, 0)):
        eye, center, up = (np.asarray(v, np.float32) for v in (eye, center, up))
        w = eye - center
        w /= np.linalg.norm(w)
        u = np.cross(up, w)
        u /= np.linalg.norm(u)
        v = np.cross(w, u)
        return np.stack([u, v, w, eye]).astype(np.float32)

    s = HostScene()
    s.cameras.append(Camera(
        frame=lookat((0.75, 0.7, 1.1), (0, 0.34, 0)),
        lens=0.05, aspect=2.4, focus=1.5))
    s.environments.append(Environment(
        frame=np.eye(4, 3, k=0, dtype=np.float32).reshape(4, 3) * 0
        + np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32),
        emission=np.array([0.6, 0.7, 0.9], np.float32)))
    # floor
    fp = np.array([[-2, 0, -2], [2, 0, -2], [2, 0, 2], [-2, 0, 2]], np.float32)
    s.shapes.append(Shape(positions=fp,
                          triangles=np.array([[0, 1, 2], [0, 2, 3]], np.int32),
                          name="floor"))
    outer = make_uvsphere(steps=(64, 64), scale=0.25)
    s.shapes.append(Shape(positions=outer["positions"],
                          normals=outer.get("normals"),
                          texcoords=outer.get("texcoords"),
                          quads=outer.get("quads"),
                          triangles=outer.get("triangles"), name="outer"))
    inner = make_uvsphere(steps=(48, 48), scale=0.12)
    s.shapes.append(Shape(positions=inner["positions"],
                          normals=inner.get("normals"),
                          texcoords=inner.get("texcoords"),
                          quads=inner.get("quads"),
                          triangles=inner.get("triangles"), name="inner"))
    # area light
    lp = np.array([[-0.4, 1.6, -0.4], [0.4, 1.6, -0.4], [0.4, 1.6, 0.4],
                   [-0.4, 1.6, 0.4]], np.float32)
    s.shapes.append(Shape(positions=lp,
                          triangles=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
                          name="light"))
    s.materials.append(Material(type=0, color=np.float32([0.7, 0.7, 0.7]),
                                name="floor"))
    s.materials.append(Material(
        type=4, color=np.float32([1.0, 0.9, 0.9]), roughness=0.0, ior=1.5,
        trdepth=0.2, name="glass"))  # refractive
    s.materials.append(Material(
        type=6, color=np.float32([0.65, 0.65, 0.65]),
        scattering=np.float32([0.9, 0.9, 0.9]), scanisotropy=0.0,
        trdepth=0.1, name="smoke"))  # volumetric
    s.materials.append(Material(type=0, emission=np.float32([15, 15, 15]),
                                color=np.float32([1, 1, 1]), name="emit"))
    ID = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)
    up = ID.copy(); up[3] = [0, 0.35, 0]
    s.instances.append(Instance(frame=ID, shape=0, material=0, name="floor"))
    s.instances.append(Instance(frame=up, shape=1, material=1, name="glass"))
    s.instances.append(Instance(frame=up, shape=2, material=2, name="smoke"))
    s.instances.append(Instance(frame=ID, shape=3, material=3, name="light"))
    out_dir = os.path.join(OUT, "standins", "nested_media")
    os.makedirs(out_dir, exist_ok=True)
    out_json = os.path.join(out_dir, "scene.json")
    save_json_scene(out_json, s)
    return out_json


def render_ref(scene_json, name, shader, res, spp, bounces):
    out = os.path.join(OUT, f"ref{name}_{shader}_{res}_{spp}spp.png")
    cmd = [REF_BIN, "--scene", scene_json, "--output", out,
           "--shader", shader, "--resolution", str(res),
           "--samples", str(spp), "--bounces", str(bounces)]
    print("+", " ".join(cmd), flush=True)
    subprocess.run(cmd, check=True, timeout=3600)
    return out


def main():
    for name, (shader, res, spp, bounces) in CONFIGS.items():
        sj = export_scene(name)
        render_ref(sj, name[:2], shader, res, spp, bounces)
    nj = make_nested_scene()
    render_ref(nj, "nested", "volpathtrace", 360, 64, 8)
    print("done")


if __name__ == "__main__":
    main()
