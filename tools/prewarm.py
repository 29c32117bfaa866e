"""Prewarm the persistent compile cache for a scene/config (VERDICT r4 #8).

Cold XLA compiles through the remote-compile tunnel take 25-60 s; the
persistent cache makes every later process start warm. Run this once per
(scene shape, shader config) — e.g. right after installing, or from a
deploy hook — and the first real render costs seconds of cache-hit compile
instead.

Usage:
  python tools/prewarm.py SCENE.json [--shader volpathtrace] [--samples 64]
                          [--resolution 720] [--bounces 4]

Equivalent CLI form: `python -m vpt_tpu.cli --scene ... --prewarm`.
Prints cold/warm compile seconds (runs the compile twice: the second
number is what future renders pay).
"""
import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("scene")
    ap.add_argument("--shader", default="volpathtrace")
    ap.add_argument("--samples", type=int, default=64)
    ap.add_argument("--resolution", type=int, default=720)
    ap.add_argument("--bounces", type=int, default=4)
    args = ap.parse_args()

    from vpt_tpu.renderer import Renderer, RenderParams
    from vpt_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    p = RenderParams(shader=args.shader, samples=args.samples,
                     resolution=args.resolution, bounces=args.bounces)
    t0 = time.time()
    r = Renderer(args.scene, p)
    t_load = time.time() - t0
    cold = r.prewarm(samples=args.samples)
    # second compile of the same program = what future processes pay
    r2 = Renderer(args.scene, p)
    warm = r2.prewarm(samples=args.samples)
    print(f"load {t_load:.1f}s  compile cold {cold:.1f}s  "
          f"warm (cache hit) {warm:.1f}s")


if __name__ == "__main__":
    main()
