"""Render checkpoint/resume.

The reference's progressive state (pathtrace_state: accumulation image +
samples counter + per-pixel RNGs, yocto_pathtrace.h:57-64) is a resumable
checkpoint in memory but is never serialized (SURVEY.md §5). Here the RNG is
counter-based, so the whole render state is just (accum, samples) plus the
render configuration — serialized as a single .npz. Resuming re-derives every
future sample's random numbers from (pixel, sample) counters, so a resumed
render is bit-identical to an uninterrupted one.
"""

from __future__ import annotations

import json
import os

import jax.numpy as jnp
import numpy as np

from .state import RenderState

_FORMAT = 1


def _config_fingerprint(params, width: int, height: int) -> dict:
    return {
        "format": _FORMAT,
        "width": int(width),
        "height": int(height),
        "shader": params.shader,
        "samples": int(params.samples),
        "bounces": int(params.bounces),
        "camera": int(params.camera),
        "resolution": int(params.resolution),
        "seed": int(params.seed),
    }


def save_checkpoint(path: str, state: RenderState, params, width: int,
                    height: int):
    """Atomic write: accumulation buffer + spp + config fingerprint."""
    tmp = path + ".tmp"
    with open(tmp, "wb") as f:
        np.savez(
            f,
            accum=np.asarray(state.accum),
            samples=np.asarray(state.samples),
            config=json.dumps(_config_fingerprint(params, width, height)),
        )
    os.replace(tmp, path)


def load_checkpoint(path: str, params, width: int, height: int) -> RenderState:
    """Restore a RenderState; raises ValueError if the checkpoint was written
    for a different render configuration."""
    with np.load(path, allow_pickle=False) as z:
        cfg = json.loads(str(z["config"]))
        want = _config_fingerprint(params, width, height)
        if cfg != want:
            diff = {k: (cfg.get(k), want[k]) for k in want
                    if cfg.get(k) != want[k]}
            raise ValueError(
                f"checkpoint {path!r} was written for a different render "
                f"config (checkpoint vs current): {diff}")
        return RenderState(
            accum=jnp.asarray(z["accum"]),
            samples=jnp.asarray(z["samples"], jnp.int32),
        )
