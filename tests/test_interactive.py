"""Interactive session tests: turntable math vs closed forms, preview +
progressive accumulation, command handling, ANSI frame rendering.

Mirrors run_interactive's state machine
(/root/reference/apps/ypathtrace/ypathtrace.cpp:90-304) headlessly."""

import numpy as np
import pytest

from vpt_tpu.interactive import InteractiveSession, ansi_image, camera_turntable
from vpt_tpu.renderer import RenderParams
from vpt_tpu.scene.testing import make_test_scene

_CACHE = {}


def _session():
    if "s" not in _CACHE:
        params = RenderParams(shader="eyelight", samples=8, resolution=48,
                              bounces=2, pratio=4)
        _CACHE["s"] = InteractiveSession(
            make_test_scene(sphere_steps=6, with_volume=False), params)
    return _CACHE["s"]


def test_turntable_orbit_preserves_focus_distance():
    frame = np.asarray(
        [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 2], np.float32).reshape(4, 3)
    f2, focus2 = camera_turntable(frame, 2.0, rotate=(0.5, 0.2))
    center = frame[3] - frame[2] * 2.0
    np.testing.assert_allclose(
        np.linalg.norm(f2[3] - center), 2.0, rtol=1e-5)
    # orthonormal frame
    np.testing.assert_allclose(f2[:3] @ f2[:3].T, np.eye(3), atol=1e-5)


def test_turntable_dolly_and_pan():
    frame = np.asarray(
        [1, 0, 0, 0, 1, 0, 0, 0, 1, 0, 0, 2], np.float32).reshape(4, 3)
    f2, focus2 = camera_turntable(frame, 2.0, dolly=0.5)
    assert focus2 == pytest.approx(3.0)
    np.testing.assert_allclose(f2[3], [0, 0, 3], atol=1e-6)
    f3, _ = camera_turntable(frame, 2.0, pan=(0.1, -0.2))
    np.testing.assert_allclose(f3[3], [0.1, -0.2, 2.0], atol=1e-6)


def test_preview_then_progressive_steps():
    s = _session()
    d0 = s.display
    assert d0 is not None and d0.shape[:2] == (s.renderer.height,
                                               s.renderer.width)
    assert np.isfinite(d0).all() and d0.max() > 0.01
    assert s.current_samples == 0
    s.step(2)
    assert s.current_samples == 2
    d2 = s.display
    assert d2.shape == d0.shape
    # refined image differs from the nearest-upscaled preview
    assert np.abs(d2 - d0).mean() > 1e-4


def test_orbit_command_changes_image_and_resets():
    s = _session()
    s.step(1)
    before = s.display
    assert s.handle_command("d")
    assert s.current_samples == 0  # accumulation restarted
    after = s.display
    assert np.abs(after - before).mean() > 1e-3  # camera moved


def test_exposure_and_quit_commands(tmp_path):
    s = _session()
    s.step(1)
    before = s.display
    s.handle_command("e")
    brighter = s.display
    assert brighter.mean() > before.mean()
    s.handle_command("E")
    out = str(tmp_path / "snap.png")
    s.handle_command("p", output=out)
    from vpt_tpu.scene.image_io import load_png

    img = load_png(out)
    assert img.shape[:2] == (s.renderer.height, s.renderer.width)
    assert s.handle_command("x")   # unknown: ignored, still running
    assert not s.handle_command("q")


def test_ansi_image_shape():
    img = np.random.rand(20, 40, 3).astype(np.float32)
    text = ansi_image(img, cols=40)
    lines = text.split("\n")
    assert len(lines) >= 5
    assert "▀" in lines[0]


def test_live_parameter_edits():
    """Reference widget parity (ypathtrace.cpp:229-268): samples / bounces /
    shader / resolution / pratio edit mid-session, each recompiling the
    render program and restarting accumulation."""
    from vpt_tpu.interactive import InteractiveSession
    from vpt_tpu.renderer import RenderParams
    from vpt_tpu.scene.testing import make_test_scene

    params = RenderParams(shader="pathtrace", samples=4, resolution=24,
                          bounces=2, pratio=4)
    sess = InteractiveSession(make_test_scene(sphere_steps=6), params)
    sess.step(1)
    assert sess.current_samples == 1

    assert sess.handle_command("bounces 3")
    assert sess.params.bounces == 3 and sess.current_samples == 0
    sess.step(1)
    assert sess.current_samples == 1

    assert sess.handle_command("shader eyelight")
    assert sess.params.shader == "eyelight"
    sess.step(1)

    assert sess.handle_command("resolution 32")
    assert sess.renderer.width >= 32 or sess.renderer.height >= 32
    sess.step(1)
    assert sess.display.shape[:2] == (sess.renderer.height,
                                      sess.renderer.width)

    assert sess.handle_command("pratio 2")
    assert sess.params.pratio == 2

    assert sess.handle_command("samples 8")
    assert sess.params.samples == 8

    # unknown word commands are not consumed as camera keys
    assert sess.handle_command("shader nosuch")
    assert sess.params.shader == "eyelight"


def test_web_viewer_serves_frames_and_commands():
    """Browser viewer (viewer_web.py): /frame.png serves the progressive
    display, /status reports samples, /cmd feeds the same command grammar as
    the terminal UI (orbit restarts accumulation; live edits rebuild)."""
    import json
    import time
    import urllib.request

    from vpt_tpu.interactive import InteractiveSession
    from vpt_tpu.renderer import RenderParams
    from vpt_tpu.scene.testing import make_test_scene
    from vpt_tpu.viewer_web import ViewerServer

    params = RenderParams(shader="eyelight", samples=4, resolution=24,
                          bounces=2, pratio=4)
    sess = InteractiveSession(make_test_scene(sphere_steps=6), params)
    server = ViewerServer(sess, port=0)
    port = server.start()
    base = f"http://127.0.0.1:{port}"
    try:
        deadline = time.time() + 120
        while time.time() < deadline:
            st = json.loads(urllib.request.urlopen(
                base + "/status", timeout=10).read())
            if st["samples"] >= 1:
                break
            time.sleep(0.3)
        assert st["samples"] >= 1
        png = urllib.request.urlopen(base + "/frame.png", timeout=10).read()
        assert png[:4] == b"\x89PNG"
        page = urllib.request.urlopen(base + "/", timeout=10).read()
        assert b"vpt_tpu" in page
        # orbit command restarts accumulation
        req = urllib.request.Request(base + "/cmd", data=b"a", method="POST")
        assert urllib.request.urlopen(req, timeout=30).status == 200
        st2 = json.loads(urllib.request.urlopen(
            base + "/status", timeout=10).read())
        assert st2["version"] > st["version"]
        # live edit through the web path
        req = urllib.request.Request(base + "/cmd", data=b"bounces 3",
                                     method="POST")
        assert urllib.request.urlopen(req, timeout=120).status == 200
        st3 = json.loads(urllib.request.urlopen(
            base + "/status", timeout=10).read())
        assert st3["bounces"] == 3
        # pointer-drag turntable: continuous orbit/pan/dolly commands
        # (reference mouse interaction, ypathtrace.cpp:269-297)
        for cmd in (b"orbit 0.12 -0.05", b"pan 0.02 0.01", b"dolly -0.1"):
            req = urllib.request.Request(base + "/cmd", data=cmd,
                                         method="POST")
            assert urllib.request.urlopen(req, timeout=60).status == 200
        st4 = json.loads(urllib.request.urlopen(
            base + "/status", timeout=10).read())
        assert st4["version"] > st3["version"]
        # multipart frame stream pushes at least one PNG part
        stream = urllib.request.urlopen(base + "/stream", timeout=30)
        assert "multipart/x-mixed-replace" in stream.headers["Content-Type"]
        head = stream.read(200)
        assert b"--vptframe" in head and b"image/png" in head
        stream.close()
        # widget panel (reference imgui params window parity): the page
        # carries form controls for every RenderParams knob and /status
        # reports the values that populate them
        assert (b'id="p_shader"' in page and b'id="p_samples"' in page
                and b'id="p_exposure"' in page and b'id="p_filmic"' in page
                and b'id="p_camera"' in page)
        assert st4["samples_target"] == 4 and st4["pratio"] == 4
        assert st4["n_cameras"] >= 1 and "exposure" in st4
        # a panel-shaped edit lands like any command
        req = urllib.request.Request(base + "/cmd", data=b"samples 6",
                                     method="POST")
        assert urllib.request.urlopen(req, timeout=120).status == 200
        st5 = json.loads(urllib.request.urlopen(
            base + "/status", timeout=10).read())
        assert st5["samples_target"] == 6
    finally:
        server.stop()
