"""Persistent dev REPL: executes snippet files to amortize JAX startup.

Usage: JAX_PLATFORMS=cpu python tools/devloop.py /tmp/dev &
Then write python code to /tmp/dev/cmd_<N>.py; output appears in
/tmp/dev/out_<N>.txt (stdout+stderr+traceback). Files are executed in
ascending N order, each in a shared global namespace (so state persists).
"""

import io
import os
import sys
import time
import traceback

def main():
    workdir = sys.argv[1] if len(sys.argv) > 1 else "/tmp/dev"
    platform = sys.argv[2] if len(sys.argv) > 2 else "cpu"
    # sitecustomize imports jax before us, so JAX_PLATFORMS in os.environ is
    # too late; use jax.config (backends initialize lazily)
    if platform == "cpu":
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=8"
        )
    os.makedirs(workdir, exist_ok=True)
    sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
    # warm up jax on import
    import jax

    jax.config.update("jax_platforms", platform)
    jax.config.update("jax_default_matmul_precision", "float32")
    import jax.numpy as jnp
    import numpy as np

    g = {"jax": jax, "jnp": jnp, "np": np}
    print(f"devloop ready on {jax.devices()}", flush=True)
    done = set()
    with open(os.path.join(workdir, "ready"), "w") as f:
        f.write(str(jax.devices()))
    while True:
        names = sorted(
            n for n in os.listdir(workdir)
            if n.startswith("cmd_") and n.endswith(".py") and n not in done
        )
        for name in names:
            done.add(name)
            path = os.path.join(workdir, name)
            out_path = os.path.join(workdir, name.replace("cmd_", "out_").replace(".py", ".txt"))
            buf = io.StringIO()
            old_out, old_err = sys.stdout, sys.stderr
            sys.stdout = sys.stderr = buf
            t0 = time.time()
            try:
                with open(path) as f:
                    code = f.read()
                exec(compile(code, path, "exec"), g)
                status = "OK"
            except BaseException:
                traceback.print_exc()
                status = "ERROR"
            finally:
                sys.stdout, sys.stderr = old_out, old_err
            with open(out_path + ".tmp", "w") as f:
                f.write(f"[{status} {time.time() - t0:.2f}s]\n" + buf.getvalue())
            os.replace(out_path + ".tmp", out_path)
        time.sleep(0.3)


if __name__ == "__main__":
    main()
