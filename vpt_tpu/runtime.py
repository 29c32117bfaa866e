"""Runtime/environment helpers: persistent compilation cache and platform
selection.

The render programs are large (unrolled bounce scans over the full material
system); cold XLA compiles through the remote-compile tunnel take minutes.
The persistent cache makes every subsequent process start warm.
"""

from __future__ import annotations

import os

_CACHE_ENABLED = False


def enable_compile_cache(path: str | None = None):
    global _CACHE_ENABLED
    if _CACHE_ENABLED:
        return
    import jax

    path = path or os.path.join(os.path.dirname(os.path.dirname(__file__)),
                                ".cache", "jax")
    os.makedirs(path, exist_ok=True)
    try:
        jax.config.update("jax_compilation_cache_dir", path)
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
        jax.config.update("jax_persistent_cache_min_entry_size_bytes", 0)
    except Exception:
        pass
    _CACHE_ENABLED = True


def force_cpu(devices: int = 8):
    """Select the CPU backend (the container pins JAX_PLATFORMS=axon via
    sitecustomize; env vars are too late — use jax.config)."""
    os.environ["XLA_FLAGS"] = (
        os.environ.get("XLA_FLAGS", "")
        + f" --xla_force_host_platform_device_count={devices}"
    )
    import jax

    jax.config.update("jax_platforms", "cpu")
