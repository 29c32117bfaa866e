"""Multi-host distributed execution (VERDICT round-2 ask #5).

Launches a REAL 2-process jax.distributed world (gloo CPU collectives,
4 virtual devices per process = 8 global devices) running the production
grad step (parallel/mesh.py: rays sharded over the global mesh, scene
replicated, gradients psum'd across processes), and checks the loss and
updated parameters against the same step computed single-process on 8
local virtual devices. Counter-based RNG makes the render contributions
bit-identical; only the psum reduction order may differ, hence allclose
rather than bitwise equality on the gradients.
"""

import os
import socket
import subprocess
import sys

import numpy as np
import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _free_port():
    s = socket.socket()
    s.bind(("127.0.0.1", 0))
    port = s.getsockname()[1]
    s.close()
    return port


def _mini_scene(tmp_path):
    from vpt_tpu.scene.json_save import save_json_scene
    from vpt_tpu.scene.procedural import make_uvsphere
    from vpt_tpu.scene.schema import (
        Camera, Environment, HostScene, Instance, Material, Shape,
    )

    s = HostScene()
    ID = np.array([[1, 0, 0], [0, 1, 0], [0, 0, 1], [0, 0, 0]], np.float32)
    cam = ID.copy()
    cam[3] = [0, 0.3, 1.6]
    s.cameras.append(Camera(frame=cam, lens=0.05, aspect=2.4, focus=1.6))
    s.environments.append(Environment(
        frame=ID, emission=np.float32([0.3, 0.35, 0.45])))
    sp = make_uvsphere(steps=(16, 16), scale=0.2)
    s.shapes.append(Shape(positions=sp["positions"],
                          normals=sp.get("normals"),
                          texcoords=sp.get("texcoords"),
                          quads=sp.get("quads"),
                          triangles=sp.get("triangles"), name="ball"))
    lp = np.array([[-0.3, 1.2, -0.3], [0.3, 1.2, -0.3], [0.3, 1.2, 0.3],
                   [-0.3, 1.2, 0.3]], np.float32)
    s.shapes.append(Shape(positions=lp,
                          triangles=np.array([[0, 2, 1], [0, 3, 2]], np.int32),
                          name="light"))
    s.materials.append(Material(
        type=6, color=np.float32([0.6, 0.6, 0.6]),
        scattering=np.float32([0.5, 0.5, 0.5]), trdepth=0.2, name="smoke"))
    s.materials.append(Material(
        type=0, emission=np.float32([10, 10, 10]),
        color=np.float32([1, 1, 1]), name="emit"))
    up = ID.copy()
    up[3] = [0, 0.3, 0]
    s.instances.append(Instance(frame=up, shape=0, material=0))
    s.instances.append(Instance(frame=ID, shape=1, material=1))
    out = tmp_path / "mini" / "scene.json"
    out.parent.mkdir()
    save_json_scene(str(out), s)
    return str(out)


def test_two_process_grad_step_matches_single_process(tmp_path):
    scene = _mini_scene(tmp_path)
    port = _free_port()
    coord = f"127.0.0.1:{port}"
    out0 = tmp_path / "proc0.npz"
    env = dict(os.environ)
    env.pop("XLA_FLAGS", None)
    procs = []
    for pid in range(2):
        procs.append(subprocess.Popen(
            [sys.executable, os.path.join(REPO, "tools", "dist_worker.py"),
             coord, "2", str(pid), scene, str(out0), "4"],
            env=env, cwd=REPO,
            stdout=subprocess.PIPE, stderr=subprocess.STDOUT, text=True))
    outs = []
    for p in procs:
        out, _ = p.communicate(timeout=800)
        outs.append(out)
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out[-3000:]
    dist = np.load(out0)
    assert int(dist["world"]) == 8

    # single-process result on this test process's 8 virtual devices
    import jax
    import jax.numpy as jnp

    from vpt_tpu.parallel.mesh import (
        extract_params, make_grad_step, make_mesh,
    )
    from vpt_tpu.renderer import Renderer, RenderParams

    params_r = RenderParams(shader="volpathtrace", samples=4, resolution=64,
                            bounces=3)
    r = Renderer(scene, params_r, devices=1)
    mesh = make_mesh()
    assert len(jax.devices()) == 8
    step = make_grad_step(mesh, r._make_shader(), r.width, r.height,
                          total_samples=params_r.samples)
    params = extract_params(r.ds)
    target = jnp.zeros((r.width * r.height, 3), jnp.float32)
    loss, new_params = jax.jit(step)(r.ds, params, target, jnp.int32(0))

    assert np.isfinite(float(loss))
    np.testing.assert_allclose(float(loss), float(dist["loss"]), rtol=1e-5)
    for k, v in new_params.items():
        np.testing.assert_allclose(
            np.asarray(v), dist[k], rtol=1e-5, atol=1e-7, err_msg=k)
