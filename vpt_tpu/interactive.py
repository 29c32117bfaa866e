"""Interactive progressive rendering session.

TPU recast of the reference's run_interactive
(/root/reference/apps/ypathtrace/ypathtrace.cpp:90-304): a low-resolution
preview at resolution/pratio is rendered synchronously on every edit, then a
progressive refinement worker advances the full-resolution accumulation off
the jitted step, publishing tonemapped frames. Camera navigation is the
yocto turntable (yocto_math.h:3289-3320) driven by keyboard commands instead
of mouse drags; display is an ANSI truecolor half-block terminal image (and
an optional PNG stream) instead of an OpenGL window.

The session core is deliberately headless-scriptable: `handle_command` and
`step` are plain methods, so tests and non-TTY drivers can run the exact
code path the terminal UI uses.
"""

from __future__ import annotations

import sys
import threading
import time

import numpy as np

from .render import state as RS
from .renderer import RenderParams, Renderer, save_render


# ---------------------------------------------------------------------------
# camera turntable (yocto_math.h:3289-3320)
# ---------------------------------------------------------------------------

def _lookat_frame(eye, center, up):
    z = eye - center
    z = z / max(np.linalg.norm(z), 1e-30)
    x = np.cross(up, z)
    x = x / max(np.linalg.norm(x), 1e-30)
    y = np.cross(z, x)
    return np.stack([x, y, z, eye]).astype(np.float32)


def camera_turntable(frame, focus, rotate=(0.0, 0.0), dolly=0.0,
                     pan=(0.0, 0.0)):
    """frame: (4,3) rows x,y,z,origin. Returns (frame, focus)."""
    frame = np.asarray(frame, np.float32).copy()
    x, y, z, o = frame[0], frame[1], frame[2], frame[3]
    if rotate[0] != 0.0 or rotate[1] != 0.0:
        phi = np.arctan2(z[2], z[0]) + rotate[0]
        theta = np.arccos(np.clip(z[1], -1.0, 1.0)) + rotate[1]
        theta = np.clip(theta, 1e-3, np.pi - 1e-3)
        new_z = np.array([
            np.sin(theta) * np.cos(phi), np.cos(theta),
            np.sin(theta) * np.sin(phi)], np.float32)
        center = o - z * focus
        new_o = center + new_z * focus
        frame = _lookat_frame(new_o, center, np.array([0, 1, 0], np.float32))
        focus = float(np.linalg.norm(new_o - center))
        x, y, z, o = frame[0], frame[1], frame[2], frame[3]
    if dolly != 0.0:
        c = o - z * focus
        focus = max(focus * (1.0 + dolly), 1e-3)
        frame[3] = c + z * focus
        o = frame[3]
    if pan[0] != 0.0 or pan[1] != 0.0:
        frame[3] = o + x * pan[0] + y * pan[1]
    return frame, focus


# ---------------------------------------------------------------------------
# terminal display
# ---------------------------------------------------------------------------

def ansi_image(srgb: np.ndarray, cols: int = 100) -> str:
    """Render an (H, W, 3) sRGB float image as ANSI truecolor half-blocks
    (two rows per character line)."""
    h, w = srgb.shape[:2]
    cols = max(8, min(cols, w))
    rows = max(2, int(round(cols * h / w)))
    rows += rows % 2
    ys = (np.arange(rows) * (h - 1) / max(rows - 1, 1)).astype(int)
    xs = (np.arange(cols) * (w - 1) / max(cols - 1, 1)).astype(int)
    img = (np.clip(srgb[np.ix_(ys, xs)], 0, 1) * 255).astype(int)
    out = []
    for r in range(0, rows, 2):
        line = []
        for c in range(cols):
            tr, tg, tb = img[r, c]
            br, bg, bb = img[r + 1, c]
            line.append(
                f"\x1b[38;2;{tr};{tg};{tb}m\x1b[48;2;{br};{bg};{bb}m▀")
        out.append("".join(line) + "\x1b[0m")
    return "\n".join(out)


# ---------------------------------------------------------------------------
# session
# ---------------------------------------------------------------------------

HELP = """interactive commands:
  a/d        orbit left/right       w/s    orbit up/down
  +/-        dolly in/out           h/j/k/l pan
  e/E        exposure +-0.5         f      toggle filmic
  1..9       switch camera          p      save PNG to --output
  r          restart accumulation   q      quit
live parameter edits (reference widgets parity, ypathtrace.cpp:229-268 —
each recompiles the render program and restarts accumulation):
  shader <name>     volpathtrace|pathtrace|naive|eyelight|normal|...
  samples <n>       target sample count
  bounces <n>       path depth
  resolution <n>    image resolution
  pratio <n>        preview downscale ratio
"""


class InteractiveSession:
    """Progressive render session with live parameter edits.

    Equivalent state machine to ypathtrace.cpp reset_display/render_worker:
    `reset()` renders the pratio preview and restarts accumulation;
    `step(n)` advances n progressive samples; `handle_command` applies an
    edit and resets when needed.
    """

    def __init__(self, scene, params: RenderParams | None = None,
                 progress=None):
        self.params = params or RenderParams()
        self.renderer = Renderer(scene, self.params, progress=progress)
        self.exposure = self.params.exposure
        self.filmic = self.params.filmic
        self.focus = float(self.renderer.arrays.cam_focus[self.params.camera])
        self._lock = threading.Lock()
        self._display = None          # (H, W, 3) sRGB float
        self._current = 0
        self._version = 0             # bumped on every edit
        self._state = None
        self._preview_step = None
        self.reset()

    # -- rendering ---------------------------------------------------------

    def _set_camera(self, frame):
        import jax.numpy as jnp

        cam = self.params.camera
        cf = np.asarray(self.renderer.ds.cam_frame)
        cf = cf.copy()
        cf[cam] = frame
        cfo = np.asarray(self.renderer.ds.cam_focus).copy()
        cfo[cam] = self.focus
        self.renderer.ds = self.renderer.ds._replace(
            cam_frame=jnp.asarray(cf), cam_focus=jnp.asarray(cfo))

    def reset(self):
        """Preview at resolution/pratio upscaled into the display, fresh
        accumulation state (ypathtrace.cpp:144-199)."""
        import jax.numpy as jnp

        r = self.renderer
        pw = max(1, r.width // self.params.pratio)
        ph = max(1, r.height // self.params.pratio)
        if self._preview_step is None:
            self._preview_step = r._build_step(1)
        # 1-spp low-res preview: reuse the full-res step on a decimated
        # pixel grid (nearest-pixel ids), cheaper than compiling a second
        # program at preview resolution
        state = RS.make_state(r.width, r.height)
        # full-res single sample is the preview when pratio is 1
        self._state = state
        preview_ids = None
        # preview via numpy nearest upscale of a small render
        small = self._render_small(pw, ph)
        up = small[
            np.minimum(np.arange(r.height) // self.params.pratio, ph - 1)][
            :, np.minimum(np.arange(r.width) // self.params.pratio, pw - 1)]
        with self._lock:
            self._display = self._tonemap(up)
            self._current = 0
            self._version += 1

    def _render_small(self, pw, ph):
        """One-sample render on a pw x ph pixel grid sampled from the full
        image plane (preview pass)."""
        import jax
        import jax.numpy as jnp

        r = self.renderer
        if not hasattr(self, "_small_fn") or self._small_sz != (pw, ph):
            shade = r._make_shader()

            def small(ds):
                ids = jnp.arange(pw * ph, dtype=jnp.uint32)
                i = (ids % pw).astype(jnp.float32)
                j = (ids // pw).astype(jnp.float32)
                u = (i + 0.5) / pw
                v = (j + 0.5) / ph
                from .render.camera import eval_camera

                c = r.params.camera
                image_uv = jnp.stack([u, v], axis=-1)
                luv = jnp.full((pw * ph, 2), 0.5)
                o, d = eval_camera(
                    ds.cam_frame[c], ds.cam_lens[c], ds.cam_film[c],
                    ds.cam_aspect[c], ds.cam_focus[c], ds.cam_aperture[c],
                    ds.cam_ortho[c], image_uv, luv)
                radiance, alpha = shade(ds, o, d, ids, jnp.int32(0))
                return jnp.concatenate([radiance, alpha[..., None]], axis=-1)

            self._small_fn = jax.jit(small)
            self._small_sz = (pw, ph)
        out = np.asarray(self._small_fn(r.ds))
        return out.reshape(ph, pw, 4)

    def step(self, n: int = 1):
        """Advance n progressive full-resolution samples; returns current
        sample count (the async worker's loop body)."""
        r = self.renderer
        version = self._version
        for _ in range(n):
            if version != self._version:
                return self._current  # edited mid-step: abandon
            self._state = self._preview_step(r.ds, self._state)
        img = np.asarray(RS.get_render(self._state))
        img = img.reshape(r.height, r.width, 4)
        with self._lock:
            if version == self._version:
                self._display = self._tonemap(img)
                self._current = int(self._state.samples)
        return self._current

    def _tonemap(self, rgba):
        import jax.numpy as jnp

        return np.asarray(RS.tonemap(
            jnp.asarray(rgba[..., :3]), exposure=self.exposure,
            filmic=self.filmic, srgb=True))

    @property
    def display(self):
        with self._lock:
            return None if self._display is None else self._display.copy()

    @property
    def current_samples(self):
        return self._current

    # -- edits --------------------------------------------------------------

    def _rebuild(self):
        """Recompile the render programs after a parameter edit (the
        reference widgets set `reedit` and rebuild state,
        ypathtrace.cpp:229-268)."""
        self.renderer._step = None
        self._preview_step = self.renderer._build_step(1)
        if hasattr(self, "_small_fn"):
            del self._small_fn
        self.reset()

    def _edit_params(self, cmd: str) -> bool:
        """Word-form live edits; returns True when cmd was consumed."""
        from .renderer import SHADER_NAMES

        parts = cmd.split()
        if len(parts) != 2:
            return False
        key, val = parts
        r = self.renderer
        if key == "shader":
            if val not in SHADER_NAMES:
                return True  # consumed; unknown shader ignored
            self.params.shader = r.params.shader = val
            self._rebuild()
        elif key in ("samples", "bounces", "resolution", "pratio"):
            try:
                n = max(1, int(val))
            except ValueError:
                return True
            if key == "pratio":
                self.params.pratio = r.params.pratio = n
                self.reset()
                return True
            setattr(self.params, key, n)
            setattr(r.params, key, n)
            if key == "resolution":
                cam = r.scene.cameras[self.params.camera]
                r.width, r.height = RS.image_size(cam.aspect, n)
            self._rebuild()
        else:
            return False
        return True

    def handle_command(self, cmd: str, output: str | None = None) -> bool:
        """Apply one keyboard command or word-form parameter edit; returns
        False on quit."""
        if " " in cmd.strip() and self._edit_params(cmd.strip()):
            return True
        rot = 0.15
        cam = self.params.camera
        frame = np.asarray(self.renderer.ds.cam_frame)[cam]
        if cmd == "q":
            return False
        parts = cmd.strip().split()
        if parts and parts[0] in ("orbit", "pan", "dolly"):
            # continuous pointer-driven control (reference mouse turntable,
            # ypathtrace.cpp:269-297: rotate = mouse_delta/100, pan likewise,
            # dolly on wheel) — the browser viewer streams drag deltas here
            try:
                vals = [float(v) for v in parts[1:3]]
            except ValueError:
                return True
            rotate, pan, dolly = (0.0, 0.0), (0.0, 0.0), 0.0
            if parts[0] == "orbit" and len(vals) == 2:
                rotate = (vals[0], vals[1])
            elif parts[0] == "pan" and len(vals) == 2:
                pan = (vals[0] * self.focus, vals[1] * self.focus)
            elif parts[0] == "dolly" and len(vals) >= 1:
                dolly = vals[0]
            frame, self.focus = camera_turntable(
                frame, self.focus, rotate=rotate, dolly=dolly, pan=pan)
            self._set_camera(frame)
            self.reset()
            return True
        if cmd in "adws+-hjkl":
            pans = {"h": (-0.05, 0), "l": (0.05, 0), "j": (0, -0.05),
                    "k": (0, 0.05)}
            rotate = {"a": (-rot, 0), "d": (rot, 0), "w": (0, -rot),
                      "s": (0, rot)}.get(cmd, (0, 0))
            dolly = {"+": -0.1, "-": 0.1}.get(cmd, 0.0)
            pan = tuple(p * self.focus for p in pans.get(cmd, (0, 0)))
            frame, self.focus = camera_turntable(
                frame, self.focus, rotate=rotate, dolly=dolly, pan=pan)
            self._set_camera(frame)
            self.reset()
        elif cmd == "e":
            self.exposure += 0.5
            self._retonemap()
        elif cmd == "E":
            self.exposure -= 0.5
            self._retonemap()
        elif cmd == "f":
            self.filmic = not self.filmic
            self._retonemap()
        elif cmd == "r":
            self.reset()
        elif cmd == "p" and output:
            img = np.asarray(RS.get_render(self._state)).reshape(
                self.renderer.height, self.renderer.width, 4)
            save_render(output, img, exposure=self.exposure,
                        filmic=self.filmic)
        elif cmd.isdigit() and cmd != "0":
            new_cam = int(cmd) - 1
            if new_cam < len(self.renderer.scene.cameras):
                self.params.camera = new_cam
                self.focus = float(
                    self.renderer.arrays.cam_focus[new_cam])
                # rebuild the step: camera id is baked into the program
                self.renderer.params.camera = new_cam
                self._rebuild()
        return True

    def _retonemap(self):
        img = np.asarray(RS.get_render(self._state)).reshape(
            self.renderer.height, self.renderer.width, 4)
        with self._lock:
            self._display = self._tonemap(img)


def run_interactive(scene_path: str, params: RenderParams, output: str,
                    cols: int = 100):
    """Terminal UI loop: progressive refinement worker + stdin commands."""
    import select
    import termios
    import tty

    session = InteractiveSession(scene_path, params, progress=lambda s: (
        sys.stderr.write(f"{s}...\n")))
    stop = threading.Event()

    def worker():
        while not stop.is_set():
            if session.current_samples < params.samples:
                session.step(1)
            else:
                time.sleep(0.05)

    t = threading.Thread(target=worker, daemon=True)
    t.start()

    sys.stderr.write(HELP)
    fd = sys.stdin.fileno()
    old = termios.tcgetattr(fd)
    last_shown = (-1, -1)
    try:
        tty.setcbreak(fd)
        running = True
        while running:
            key = (session._version, session.current_samples)
            if key != last_shown:
                disp = session.display
                if disp is not None:
                    sys.stdout.write("\x1b[H\x1b[2J")
                    sys.stdout.write(ansi_image(disp, cols=cols))
                    sys.stdout.write(
                        f"\n{session.current_samples}/{params.samples} spp  "
                        f"exposure {session.exposure:+.1f}"
                        f"{' filmic' if session.filmic else ''}   "
                        "[q]uit [p]ng a/d/w/s orbit\n")
                    sys.stdout.flush()
                    last_shown = key
            rl, _, _ = select.select([sys.stdin], [], [], 0.1)
            if rl:
                cmd = sys.stdin.read(1)
                running = session.handle_command(cmd, output=output)
    finally:
        stop.set()
        t.join(timeout=5)
        termios.tcsetattr(fd, termios.TCSADRAIN, old)
