"""Benchmark driver: rays/sec/chip on tests/03_volume (BASELINE.json metric).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
The reference publishes no numbers (BASELINE.md), so vs_baseline is measured
against a recorded first-round figure kept in this file.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# recorded result of the first working TPU build (round 1); later rounds are
# measured against it so progress is visible to the driver
ROUND1_BASELINE_PATHS_PER_SEC = 120_000.0

SCENE = "/root/reference/tests/03_volume/volume.json"


def main():
    from vpt_tpu.renderer import Renderer, RenderParams
    from vpt_tpu.runtime import enable_compile_cache

    enable_compile_cache()
    params = RenderParams(
        shader="volpathtrace", samples=64, resolution=360, bounces=8)
    r = Renderer(SCENE, params)
    # rays_per_sec compiles, warms, then times `samples` progressive samples
    rps = r.rays_per_sec(samples=16, chunk=4)
    print(json.dumps({
        "metric": "paths/sec/chip volpathtrace fwd tests/03_volume 360px b8",
        "value": round(rps, 1),
        "unit": "paths/s",
        "vs_baseline": round(rps / ROUND1_BASELINE_PATHS_PER_SEC, 3),
    }))


if __name__ == "__main__":
    main()
