"""Walker/Vose alias tables: O(1) categorical sampling on device.

Replaces binary search over large CDFs (the environment light's per-texel
CDF has millions of entries; a searchsorted there costs ~21 dependent
gathers per ray) with two gathers. Construction is host-side (native C++
when available, pure Python otherwise); sampling lives in
vpt_tpu.render.lights.
"""

from __future__ import annotations

import numpy as np


def build_alias(weights: np.ndarray):
    """Returns (alias_idx (N,) int32, cut (N,) float32): draw x = r*N,
    i = floor(x); keep i if accept-uniform < cut[i] else take alias_idx[i].
    Reproduces weights/sum(weights) exactly."""
    w = np.asarray(weights, np.float32)
    n = w.shape[0]
    if n == 0:
        return np.zeros(0, np.int32), np.zeros(0, np.float32)
    from .. import native

    out = native.alias_build(w)
    if out is not None:
        return out
    total = float(w.sum())
    p = (w.astype(np.float64) * n / total) if total > 0 else np.ones(n)
    alias = np.arange(n, dtype=np.int32)
    cut = np.ones(n, np.float32)
    small = [i for i in range(n) if p[i] < 1.0]
    large = [i for i in range(n) if p[i] >= 1.0]
    while small and large:
        s = small.pop()
        l = large[-1]
        cut[s] = p[s]
        alias[s] = l
        p[l] -= 1.0 - p[s]
        if p[l] < 1.0:
            large.pop()
            small.append(l)
    return alias, cut
