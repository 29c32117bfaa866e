"""Command-line renderer mirroring the reference ypathtrace app
(/root/reference/apps/ypathtrace/ypathtrace.cpp:307-341).

Usage:
    python -m vpt_tpu.cli --scene scene.json --output out.png \
        --shader volpathtrace --samples 256 --resolution 720 --bounces 64
"""

from __future__ import annotations

import argparse
import sys
import time

from .renderer import SHADER_NAMES, RenderParams, Renderer, save_render


def _progress_bar(label, current, total, t0, width=20):
    frac = current / max(total, 1)
    n = int(frac * width)
    elapsed = time.time() - t0
    mins, secs = divmod(elapsed, 60)
    bar = "#" * n + "-" * (width - n)
    sys.stderr.write(
        f"\r{label}: [{bar}] {current}/{total} {int(mins):02d}:{secs:06.3f}")
    sys.stderr.flush()
    if current >= total:
        sys.stderr.write("\n")


def main(argv=None):
    ap = argparse.ArgumentParser("vpt_tpu", description=__doc__)
    ap.add_argument("--scene", required=True, help="scene JSON filename")
    ap.add_argument("--output", default="out.png", help="output image filename")
    ap.add_argument("--interactive", action="store_true",
                    help="progressive terminal viewer with camera turntable")
    ap.add_argument("--interactive-web", action="store_true",
                    help="progressive browser viewer (HTTP on --port)")
    ap.add_argument("--port", type=int, default=8000,
                    help="port for --interactive-web")
    ap.add_argument("--pratio", type=int, default=8,
                    help="preview downscale ratio (interactive)")
    ap.add_argument("--shader", default="pathtrace", choices=SHADER_NAMES)
    ap.add_argument("--samples", type=int, default=512)
    ap.add_argument("--resolution", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=4)
    ap.add_argument("--camera", type=int, default=0)
    ap.add_argument("--noparallel", action="store_true",
                    help="accepted for CLI parity; execution is always batched")
    ap.add_argument("--noimplicitmis", action="store_true")
    ap.add_argument("--stmaxiter", type=int, default=450)
    ap.add_argument("--exposure", type=float, default=0.0)
    ap.add_argument("--filmic", action="store_true")
    ap.add_argument("--cpu", action="store_true", help="force CPU backend")
    ap.add_argument("--devices", type=int, default=0,
                    help="local devices to shard pixels over (0 = all)")
    ap.add_argument("--checkpoint", default=None,
                    help="render-state .npz: resume if present, saved "
                         "periodically and at completion")
    ap.add_argument("--checkpoint-every", type=int, default=0,
                    help="samples between checkpoint saves (default: chunk)")
    ap.add_argument("--stats", action="store_true",
                    help="print scene statistics after loading")
    ap.add_argument("--validate", action="store_true",
                    help="print scene validation errors after loading")
    ap.add_argument("--config", default=None,
                    help="JSON file of option defaults (yocto_cli.h:194 "
                         "add_option_with_config parity); explicit CLI flags "
                         "override config values")
    ap.add_argument("--prewarm", action="store_true",
                    help="compile this scene/params' render program into "
                         "the persistent cache and exit (later runs start "
                         "warm; see PERF.md cold-start notes)")
    args = ap.parse_args(argv)

    if args.config:
        import json as _json

        with open(args.config) as f:
            cfg = _json.load(f)
        defaults = {a.dest: a.default for a in ap._actions}
        for key, val in cfg.items():
            dest = key.replace("-", "_")
            if dest not in defaults:
                raise SystemExit(f"{args.config}: unknown option {key!r}")
            # CLI wins only where the user deviated from the default
            if getattr(args, dest) == defaults[dest]:
                setattr(args, dest, val)

    # numeric option ranges (ypathtrace.cpp:314-329 via yocto_cli's
    # add_option(..., range) — checked after config merge so config-file
    # values are validated too)
    RANGES = {"resolution": (1, 4096), "samples": (1, 4096),
              "bounces": (1, 128), "stmaxiter": (1, 512),
              "pratio": (1, 64), "camera": (0, 64)}
    for dest, (lo, hi) in RANGES.items():
        v = getattr(args, dest)
        if not (lo <= int(v) <= hi):
            raise SystemExit(
                f"--{dest}: value {v} out of range [{lo}, {hi}]")

    if args.cpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    params = RenderParams(
        camera=args.camera, resolution=args.resolution, shader=args.shader,
        samples=args.samples, bounces=args.bounces,
        noimplicit_mis=args.noimplicitmis,
        spheretrace_maxiter=args.stmaxiter,
        exposure=args.exposure, filmic=args.filmic, pratio=args.pratio,
    )

    if args.interactive:
        from .interactive import run_interactive

        run_interactive(args.scene, params, args.output)
        return
    if args.interactive_web:
        from .viewer_web import run_web_viewer

        run_web_viewer(args.scene, params, port=args.port)
        return

    t0 = time.time()
    stage = {"t": time.time()}

    def progress(label):
        now = time.time()
        sys.stderr.write(f"{label}... ({now - stage['t']:.2f}s)\n")
        stage["t"] = now

    renderer = Renderer(args.scene, params, progress=progress,
                        devices=(args.devices or None))
    if args.stats or args.validate:
        from .scene.stats import scene_stats, scene_validation

        if args.stats:
            for line in scene_stats(renderer.scene):
                sys.stderr.write(line + "\n")
        if args.validate:
            errs = scene_validation(renderer.scene)
            for e in errs:
                sys.stderr.write(f"validation: {e}\n")
            if not errs:
                sys.stderr.write("validation: ok\n")
    if args.prewarm:
        secs = renderer.prewarm(samples=args.samples)
        sys.stderr.write(
            f"prewarm: compiled {renderer.width}x{renderer.height} "
            f"{args.shader} program in {secs:.1f}s (persistent cache "
            f"populated; identical future runs start warm)\n")
        return
    sys.stderr.write(
        f"rendering {renderer.width}x{renderer.height} "
        f"{args.samples}spp {args.shader} "
        f"on {renderer.n_devices} device(s)\n")
    rt0 = time.time()
    bar_t0 = {"t": rt0}

    def render_progress(c, t):
        if c < 0:  # compile-finished signal (renderer AOT-compiles first)
            sys.stderr.write(
                f"compiled render program in "
                f"{renderer.compile_seconds:.1f}s (cached for identical "
                f"configs)\n")
            bar_t0["t"] = time.time()
            return
        _progress_bar("render", c, t, bar_t0["t"])

    img, _ = renderer.render(
        progress=render_progress,
        checkpoint=args.checkpoint, checkpoint_every=args.checkpoint_every)
    rays = renderer.width * renderer.height * args.samples
    dt = time.time() - bar_t0["t"]
    sys.stderr.write(f"render: {dt:.2f}s  ({rays / dt / 1e6:.2f} Mpaths/s)\n")
    save_render(args.output, img, exposure=args.exposure, filmic=args.filmic)
    sys.stderr.write(f"saved {args.output}  total {time.time() - t0:.2f}s\n")


if __name__ == "__main__":
    main()
