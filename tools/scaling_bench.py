"""Scaling-efficiency harness (BASELINE.md: >=80% efficiency 1 -> N devices).

Renders the procedural 03_volume-class test scene with pixels sharded over
1, 2, 4, ..., N local devices and reports paths/sec plus efficiency relative
to the single-device rate. On real multi-chip hardware this measures ICI
scaling; with XLA_FLAGS=--xla_force_host_platform_device_count=8 it
validates the sharded program end-to-end (virtual CPU devices share cores,
so the efficiency column is about program overhead, not hardware scaling).

Usage:
  python tools/scaling_bench.py [--resolution 360] [--samples 8] [--cpu8]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--resolution", type=int, default=360)
    ap.add_argument("--samples", type=int, default=8)
    ap.add_argument("--bounces", type=int, default=8)
    ap.add_argument("--cpu8", action="store_true",
                    help="force an 8-device virtual CPU mesh")
    ap.add_argument("--multihost", type=int, default=0, metavar="N",
                    help="spawn N jax.distributed processes (4 virtual CPU "
                         "devices each, gloo collectives) and measure the "
                         "global-mesh forward throughput for 1..N processes")
    args = ap.parse_args()

    if args.multihost:
        _multihost(args.multihost)
        return

    if args.cpu8:
        os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "")
                                   + " --xla_force_host_platform_device_count=8")
    import jax

    if args.cpu8:
        jax.config.update("jax_platforms", "cpu")

    from vpt_tpu.renderer import RenderParams, Renderer
    from vpt_tpu.scene.testing import make_test_scene

    n_total = len(jax.devices())
    params = RenderParams(shader="volpathtrace", samples=args.samples,
                          resolution=args.resolution, bounces=args.bounces)
    sizes = []
    n = 1
    while n <= n_total:
        sizes.append(n)
        n *= 2
    if sizes[-1] != n_total:
        sizes.append(n_total)

    rows = []
    base = None
    for nd in sizes:
        r = Renderer(make_test_scene(), params, devices=nd)
        rps = r.rays_per_sec(samples=args.samples, chunk=4)
        if base is None:
            base = rps
        eff = rps / (base * nd)
        rows.append({"devices": nd, "paths_per_sec": round(rps, 1),
                     "speedup": round(rps / base, 3),
                     "efficiency": round(eff, 3)})
        print(json.dumps(rows[-1]), flush=True)
    print(json.dumps({"platform": jax.devices()[0].platform,
                      "n_devices": n_total, "rows": rows}))


def _multihost(n_max: int):
    """Spawn 1, 2, ..., n_max worker processes (tools/dist_worker.py bench
    mode), each a jax.distributed participant with 4 virtual CPU devices,
    and report global forward paths/s + efficiency vs the 1-process run.
    NOTE: virtual devices share this host's physical cores, so efficiency
    here measures distributed-program overhead (collectives, sharding),
    not hardware scaling."""
    import socket
    import subprocess
    import tempfile

    import numpy as np

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    # a small scene: the point is distributed-program overhead, and the
    # virtual devices all share this host's 2 physical cores anyway
    import tempfile

    scene_dir = tempfile.mkdtemp()
    sys.path.insert(0, os.path.join(repo, "tests"))
    from test_distributed import _mini_scene
    from pathlib import Path

    scene = _mini_scene(Path(scene_dir))
    rows = []
    base = None
    nprocs = 1
    while nprocs <= n_max:
        s = socket.socket()
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]
        s.close()
        with tempfile.TemporaryDirectory() as td:
            out0 = os.path.join(td, "bench.npz")
            env = dict(os.environ)
            env.pop("XLA_FLAGS", None)
            procs = [subprocess.Popen(
                [sys.executable, os.path.join(repo, "tools", "dist_worker.py"),
                 f"127.0.0.1:{port}", str(nprocs), str(pid), scene, out0,
                 "4", "bench"], env=env, cwd=repo)
                for pid in range(nprocs)]
            for p in procs:
                p.wait(timeout=900)
                assert p.returncode == 0
            d = np.load(out0)
            pps = float(d["paths_per_sec"])
        if base is None:
            base = pps
        rows.append({"processes": nprocs, "devices": int(4 * nprocs),
                     "paths_per_sec": round(pps, 1),
                     "speedup": round(pps / base, 3),
                     "efficiency": round(pps / (base * nprocs), 3)})
        print(json.dumps(rows[-1]), flush=True)
        nprocs *= 2
    print(json.dumps({"platform": "cpu-multihost-gloo", "rows": rows}))


if __name__ == "__main__":
    main()
