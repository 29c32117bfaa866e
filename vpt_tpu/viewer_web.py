"""Browser-based interactive viewer — the graphical equivalent of the
reference's GLFW/ImGui window (run_interactive, ypathtrace.cpp:90-304),
recast for a headless TPU host: a local HTTP server streams the progressive
render as PNG frames to an HTML canvas and feeds keyboard/command events
back into the same InteractiveSession state machine the terminal viewer
uses (camera turntable, exposure/filmic, live shader/samples/bounces/
resolution/pratio edits).

Endpoints:
  GET  /            viewer page
  GET  /frame.png   current tonemapped display (ETag = version:samples)
  GET  /status      JSON {samples, version, params}
  POST /cmd         body = command string (same grammar as the terminal UI)
"""

from __future__ import annotations

import json
import threading
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer

import numpy as np

PAGE = """<!doctype html>
<html><head><title>vpt_tpu viewer</title><style>
body { background:#111; color:#ccc; font:13px monospace; margin:12px; }
img { image-rendering:pixelated; border:1px solid #333; max-width:100%; }
#bar { margin:6px 0; }
input { background:#222; color:#ccc; border:1px solid #444; width:22em; }
#panel { display:flex; flex-wrap:wrap; gap:10px; align-items:center;
  background:#1a1a1a; border:1px solid #333; padding:6px 8px; margin:6px 0; }
#panel label { color:#8a8; }
#panel input[type=number] { width:5em; }
#panel input[type=range] { width:8em; vertical-align:middle; }
#panel select, #panel button, #panel input {
  background:#222; color:#ccc; border:1px solid #444; }
</style></head><body>
<div id="bar">vpt_tpu — keys: a/d/w/s orbit, +/- dolly, h/j/k/l pan,
 e/E exposure, f filmic, r restart &nbsp; <span id="st"></span></div>
<div id="panel">
 <label>shader <select id="p_shader"></select></label>
 <label>camera <select id="p_camera"></select></label>
 <label>resolution <input id="p_resolution" type="number" min="1" max="4096"/></label>
 <label>samples <input id="p_samples" type="number" min="1" max="65536"/></label>
 <label>bounces <input id="p_bounces" type="number" min="1" max="128"/></label>
 <label>pratio <input id="p_pratio" type="number" min="1" max="64"/></label>
 <label>exposure <input id="p_exposure" type="range" min="-5" max="5"
   step="0.5"/> <span id="p_expv"></span></label>
 <label>filmic <input id="p_filmic" type="checkbox"/></label>
 <button id="p_restart">restart</button>
</div>
<div><input id="cmd" placeholder="command: shader pathtrace | samples 64 | bounces 8 | resolution 360 | pratio 4"/></div>
<img id="view" src="/stream" draggable="false"/>
<script>
const img = document.getElementById("view");
const st = document.getElementById("st");
function send(c) { fetch("/cmd", {method: "POST", body: c}); }
// ---- widget panel (reference imgui params window, ypathtrace.cpp:229-268):
// every RenderParams edit as a form control posting the command grammar ----
const SHADERS = ["volpathtrace","pathtrace","naive","eyelight","normal",
                 "texcoord","color","implicit","implicit_normal"];
const shSel = document.getElementById("p_shader");
SHADERS.forEach(n => shSel.add(new Option(n, n)));
shSel.addEventListener("change", () => send("shader " + shSel.value));
const camSel = document.getElementById("p_camera");
camSel.addEventListener("change", () => send(camSel.value));
for (const k of ["resolution", "samples", "bounces", "pratio"]) {
  const el = document.getElementById("p_" + k);
  el.addEventListener("change", () => {
    const v = Math.max(+el.min, Math.min(+el.max, Math.round(+el.value)));
    el.value = v; send(k + " " + v);
  });
}
const expEl = document.getElementById("p_exposure");
const expV = document.getElementById("p_expv");
let expSync = 0;
expEl.addEventListener("change", () => {
  // exposure moves in 0.5 steps via the e/E commands
  const delta = +expEl.value - expSync;
  const steps = Math.round(Math.abs(delta) / 0.5);
  for (let i = 0; i < steps; i++) send(delta > 0 ? "e" : "E");
  expSync += Math.sign(delta) * steps * 0.5;
  expV.textContent = expSync.toFixed(1);
});
document.getElementById("p_filmic").addEventListener("change", () => send("f"));
document.getElementById("p_restart").addEventListener("click", () => send("r"));
let editing = null;
document.querySelectorAll("#panel input, #panel select").forEach(el => {
  el.addEventListener("focus", () => editing = el);
  el.addEventListener("blur", () => editing = null);
});
async function tick() {
  try {
    const s = await (await fetch("/status")).json();
    st.textContent = s.samples + " spp  " + s.width + "x" + s.height;
    const set = (id, v) => {
      const el = document.getElementById(id);
      if (el !== editing && document.activeElement !== el) el.value = v;
    };
    set("p_shader", s.shader);
    set("p_resolution", s.resolution); set("p_samples", s.samples_target);
    set("p_bounces", s.bounces); set("p_pratio", s.pratio);
    if (editing !== expEl) { expEl.value = s.exposure; expSync = s.exposure;
      expV.textContent = (+s.exposure).toFixed(1); }
    document.getElementById("p_filmic").checked = s.filmic;
    if (camSel.length !== s.n_cameras) {
      camSel.length = 0;
      for (let i = 1; i <= s.n_cameras; i++)
        camSel.add(new Option("camera " + i, String(i)));
    }
    if (camSel !== editing) camSel.value = String(s.camera + 1);
  } catch (e) {}
  setTimeout(tick, 500);
}
tick();
// pointer-drag turntable (reference: alt+mouse in the GLFW window,
// ypathtrace.cpp:269-297 — rotate = delta/100; shift/right-drag pans)
let drag = null, acc = [0, 0], accMode = "orbit", flushTimer = null;
function flush() {
  flushTimer = null;
  if (acc[0] || acc[1]) {
    send(accMode + " " + acc[0].toFixed(4) + " " + acc[1].toFixed(4));
    acc = [0, 0];
  }
}
img.addEventListener("pointerdown", (ev) => {
  drag = [ev.clientX, ev.clientY];
  accMode = (ev.button === 2 || ev.shiftKey) ? "pan" : "orbit";
  img.setPointerCapture(ev.pointerId);
  ev.preventDefault();
});
img.addEventListener("pointermove", (ev) => {
  if (!drag) return;
  const dx = (ev.clientX - drag[0]) / 100, dy = (ev.clientY - drag[1]) / 100;
  drag = [ev.clientX, ev.clientY];
  if (accMode === "pan") { acc[0] -= dx; acc[1] += dy; }
  else { acc[0] += dx; acc[1] += dy; }
  if (!flushTimer) flushTimer = setTimeout(flush, 60);
});
img.addEventListener("pointerup", (ev) => { drag = null; flush(); });
img.addEventListener("contextmenu", (ev) => ev.preventDefault());
img.addEventListener("wheel", (ev) => {
  send("dolly " + (ev.deltaY > 0 ? 0.1 : -0.1));
  ev.preventDefault();
}, {passive: false});
document.addEventListener("keydown", (ev) => {
  if (ev.target.tagName === "INPUT") return;
  if ("adws+-hjkleEfr123456789".includes(ev.key)) send(ev.key);
});
document.getElementById("cmd").addEventListener("keydown", (ev) => {
  if (ev.key === "Enter") { send(ev.target.value); ev.target.value = ""; }
});
</script></body></html>"""


class ViewerServer:
    """Wraps an InteractiveSession with an HTTP frontend + refine worker."""

    def __init__(self, session, host: str = "127.0.0.1", port: int = 0):
        self.session = session
        self._stop = threading.Event()
        self._worker = threading.Thread(target=self._refine, daemon=True)
        outer = self

        class Handler(BaseHTTPRequestHandler):
            def log_message(self, *a):  # quiet
                pass

            def _send(self, code, ctype, body):
                self.send_response(code)
                self.send_header("Content-Type", ctype)
                self.send_header("Content-Length", str(len(body)))
                self.send_header("Cache-Control", "no-store")
                self.end_headers()
                self.wfile.write(body)

            def do_GET(self):
                s = outer.session
                if self.path.startswith("/stream"):
                    # multipart/x-mixed-replace push stream: a new frame is
                    # written whenever the progressive state advances (the
                    # reference redraws its GL texture per refinement pass,
                    # ypathtrace.cpp:215-228); replaces PNG polling
                    from .scene.image_io import encode_png

                    self.send_response(200)
                    self.send_header(
                        "Content-Type",
                        "multipart/x-mixed-replace; boundary=vptframe")
                    self.send_header("Cache-Control", "no-store")
                    self.end_headers()
                    last = None
                    try:
                        while not outer._stop.is_set():
                            key = (s._version, s.current_samples)
                            disp = s.display
                            if key == last or disp is None:
                                outer._stop.wait(0.1)
                                continue
                            last = key
                            rgba = np.concatenate(
                                [np.clip(disp, 0, 1),
                                 np.ones_like(disp[..., :1])], axis=-1)
                            body = encode_png(
                                (rgba * 255 + 0.5).astype(np.uint8))
                            self.wfile.write(
                                b"--vptframe\r\n"
                                b"Content-Type: image/png\r\n"
                                b"Content-Length: "
                                + str(len(body)).encode() + b"\r\n\r\n")
                            self.wfile.write(body)
                            self.wfile.write(b"\r\n")
                            self.wfile.flush()
                    except (BrokenPipeError, ConnectionResetError):
                        pass
                    return
                if self.path.startswith("/frame.png"):
                    disp = s.display
                    if disp is None:
                        self._send(503, "text/plain", b"not ready")
                        return
                    from .scene.image_io import encode_png

                    rgba = np.concatenate(
                        [np.clip(disp, 0, 1),
                         np.ones_like(disp[..., :1])], axis=-1)
                    self._send(200, "image/png",
                               encode_png((rgba * 255 + 0.5).astype(np.uint8)))
                elif self.path.startswith("/status"):
                    body = json.dumps({
                        "samples": s.current_samples,
                        "version": s._version,
                        "width": s.renderer.width,
                        "height": s.renderer.height,
                        "shader": s.params.shader,
                        "bounces": s.params.bounces,
                        # widget-panel state (reference imgui params window)
                        "samples_target": s.params.samples,
                        "resolution": s.params.resolution,
                        "pratio": s.params.pratio,
                        "exposure": s.exposure,
                        "filmic": bool(s.filmic),
                        "camera": s.params.camera,
                        "n_cameras": len(s.renderer.scene.cameras),
                    }).encode()
                    self._send(200, "application/json", body)
                else:
                    self._send(200, "text/html", PAGE.encode())

            def do_POST(self):
                if not self.path.startswith("/cmd"):
                    self._send(404, "text/plain", b"")
                    return
                n = int(self.headers.get("Content-Length", 0))
                cmd = self.rfile.read(n).decode().strip()
                alive = outer.session.handle_command(cmd)
                if not alive:
                    outer._stop.set()
                self._send(200, "text/plain", b"ok")

        self.httpd = ThreadingHTTPServer((host, port), Handler)
        self.port = self.httpd.server_address[1]
        self._serve = threading.Thread(
            target=self.httpd.serve_forever, daemon=True)

    def _refine(self):
        target = self.session.params.samples
        while not self._stop.is_set():
            if self.session.current_samples < target:
                self.session.step(1)
            else:
                self._stop.wait(0.1)

    def start(self):
        self._serve.start()
        self._worker.start()
        return self.port

    def stop(self):
        self._stop.set()
        self.httpd.shutdown()
        # join the refine worker before interpreter teardown: a daemon
        # thread mid-JAX-dispatch at process exit aborts inside the PJRT
        # client destructor ("terminate called after throwing ...") — the
        # run is green but CI logs end with what looks like a crash
        self._worker.join(timeout=30)
        self._serve.join(timeout=5)
        self.httpd.server_close()


def run_web_viewer(scene_path: str, params, host: str = "127.0.0.1",
                   port: int = 8000):
    from .interactive import InteractiveSession

    session = InteractiveSession(scene_path, params)
    server = ViewerServer(session, host, port)
    actual = server.start()
    print(f"viewer: http://{host}:{actual}/  (ctrl-c to stop)", flush=True)
    try:
        while not server._stop.is_set():
            server._stop.wait(0.5)
    except KeyboardInterrupt:
        pass
    server.stop()
