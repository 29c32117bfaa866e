"""Counter-based per-pixel RNG.

The reference keeps one mutable PCG32 stream per pixel
(/root/reference/libs/yocto_pathtrace/yocto_pathtrace.cpp:975-978). A mutable
stream is hostile to SPMD/XLA, so the TPU-native design replaces it with a
deterministic counter scheme: every random draw is addressed by
(pixel, sample, bounce, slot) and computed stateless-ly. This is invariant
under any sharding of the pixel axis, which makes multi-chip renders
bit-deterministic.

We use a small, fast Philox-like 32-bit mixer rather than jax.random's
threefry, because the integrators need many cheap independent draws per
scan step and we want full control of the addressing. Quality is ample for
Monte Carlo rendering (equidistribution smoke tests in tests/test_core.py).
"""

from __future__ import annotations

import jax.numpy as jnp

_M0 = jnp.uint32(0xD2511F53)
_M1 = jnp.uint32(0xCD9E8D57)
_W0 = jnp.uint32(0x9E3779B9)
_W1 = jnp.uint32(0xBB67AE85)


def _mulhilo(a, b):
    """32x32 -> 64 multiply in pure uint32 math (x64 mode is disabled)."""
    a = jnp.asarray(a, jnp.uint32)
    b = jnp.asarray(b, jnp.uint32)
    mask = jnp.uint32(0xFFFF)
    a_lo, a_hi = a & mask, a >> jnp.uint32(16)
    b_lo, b_hi = b & mask, b >> jnp.uint32(16)
    p0 = a_lo * b_lo
    p1 = a_lo * b_hi
    p2 = a_hi * b_lo
    p3 = a_hi * b_hi
    mid = (p0 >> jnp.uint32(16)) + (p1 & mask) + (p2 & mask)
    lo = (p0 & mask) | (mid << jnp.uint32(16))
    hi = p3 + (p1 >> jnp.uint32(16)) + (p2 >> jnp.uint32(16)) + (mid >> jnp.uint32(16))
    return hi, lo


def philox2x32(counter0, counter1, key, rounds: int = 7):
    """Philox-2x32 block cipher; returns two uint32 streams."""
    c0 = jnp.asarray(counter0, dtype=jnp.uint32)
    c1 = jnp.asarray(counter1, dtype=jnp.uint32)
    k = jnp.asarray(key, dtype=jnp.uint32)
    for _ in range(rounds):
        hi, lo = _mulhilo(_M0, c0)
        c0, c1 = hi ^ k ^ c1, lo
        k = k + _W0
    return c0, c1


def uniform_u32(pixel_id, sample_id, slot, seed: int = 1301081):
    """One uint32 per (pixel, sample, slot) triple.

    slot packs (bounce, draw-index); the caller guarantees uniqueness.
    Default seed mirrors the reference master seed 1301081
    (yocto_pathtrace.cpp:975) so runs are reproducible by default.
    """
    c0 = jnp.asarray(pixel_id, dtype=jnp.uint32)
    c1 = jnp.asarray(sample_id, dtype=jnp.uint32) * jnp.uint32(0x01000193) + jnp.asarray(
        slot, dtype=jnp.uint32
    )
    key = jnp.uint32(seed)
    r0, _ = philox2x32(c0, c1, key)
    return r0


def uniform_float(pixel_id, sample_id, slot, seed: int = 1301081):
    """Uniform float in [0, 1) using the same bit trick as yocto rand1f
    (yocto_sampling.h:206-216): mantissa fill then subtract 1."""
    bits = uniform_u32(pixel_id, sample_id, slot, seed)
    f = ((bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)).view(jnp.float32)
    return f - 1.0


class SlotCounter:
    """Helper to hand out unique draw slots inside an integrator step.

    Usage: rc = SlotCounter(base); u = rc.next1(px, sp); uv = rc.next2(px, sp)
    Slots are compile-time constants, so addressing is static under jit.
    """

    def __init__(self, base: int, seed: int = 1301081):
        self.base = base
        self.seed = seed

    def next1(self, pixel_id, sample_id):
        s = self.base
        self.base += 1
        return uniform_float(pixel_id, sample_id, s, self.seed)

    def next2(self, pixel_id, sample_id):
        x = self.next1(pixel_id, sample_id)
        y = self.next1(pixel_id, sample_id)
        return jnp.stack([x, y], axis=-1)

    def next3(self, pixel_id, sample_id):
        x = self.next1(pixel_id, sample_id)
        y = self.next1(pixel_id, sample_id)
        z = self.next1(pixel_id, sample_id)
        return jnp.stack([x, y, z], axis=-1)
