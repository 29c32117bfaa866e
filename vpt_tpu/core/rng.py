"""Counter-based per-pixel RNG.

The reference keeps one mutable PCG32 stream per pixel
(/root/reference/libs/yocto_pathtrace/yocto_pathtrace.cpp:975-978). A mutable
stream is hostile to SPMD/XLA, so the TPU-native design replaces it with a
deterministic counter scheme: every random draw is addressed by
(pixel, sample, bounce, slot) and computed stateless-ly. This is invariant
under any sharding of the pixel axis, which makes multi-chip renders
bit-deterministic.

We use Threefry-2x32 — the same add/xor/rotate cipher jax.random is built
on — implemented directly for full control of the (pixel, sample, slot)
addressing. Threefry is the right choice for the TPU VPU specifically:
it contains NO integer multiplies (the VPU lowers a 32x32 multiply to a
long instruction sequence; a Philox-2x32 mixer measured ~16 ms per bounce
for the integrator's draws on a v5e — ~170x the ALU estimate — while the
add/xor/rotate rounds run at full vector rate). Quality is ample for
Monte Carlo rendering (equidistribution smoke tests in tests/test_core.py).
"""

from __future__ import annotations

import jax.numpy as jnp

_ROT0 = (13, 15, 26, 6)
_ROT1 = (17, 29, 16, 24)
_PARITY = 0x1BD11BDA


def _rotl(x, r: int):
    return (x << jnp.uint32(r)) | (x >> jnp.uint32(32 - r))


def threefry2x32(counter0, counter1, key0, key1):
    """Standard 20-round Threefry-2x32 (same schedule as jax.random);
    returns two uint32 streams."""
    x0 = jnp.asarray(counter0, jnp.uint32)
    x1 = jnp.asarray(counter1, jnp.uint32)
    ks0 = jnp.uint32(key0)
    ks1 = jnp.uint32(key1)
    ks2 = ks0 ^ ks1 ^ jnp.uint32(_PARITY)
    x0 = x0 + ks0
    x1 = x1 + ks1
    keys = (ks0, ks1, ks2)
    for block in range(5):
        rots = _ROT0 if block % 2 == 0 else _ROT1
        for r in rots:
            x0 = x0 + x1
            x1 = _rotl(x1, r) ^ x0
        x0 = x0 + keys[(block + 1) % 3]
        x1 = x1 + keys[(block + 2) % 3] + jnp.uint32(block + 1)
    return x0, x1


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
    r0, _ = threefry2x32(c0, c1, jnp.uint32(seed), jnp.uint32(0x85EBCA6B))
    return r0


def uniform_float(pixel_id, sample_id, slot, seed: int = 1301081):
    """Uniform float in [0, 1) using the same bit trick as yocto rand1f
    (yocto_sampling.h:206-216): mantissa fill then subtract 1."""
    bits = uniform_u32(pixel_id, sample_id, slot, seed)
    f = ((bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000)).view(jnp.float32)
    return f - 1.0


def uniform_float_pair(pixel_id, sample_id, slot, seed: int = 1301081):
    """TWO uniforms from ONE threefry call (the cipher produces a 2x32
    block; discarding half doubles the integrator's RNG cost). Addresses
    draws (slot, slot+1); callers use even slots so the pair space never
    collides with uniform_float's single-draw slots."""
    c0 = jnp.asarray(pixel_id, dtype=jnp.uint32)
    c1 = jnp.asarray(sample_id, dtype=jnp.uint32) * jnp.uint32(0x01000193) + (
        jnp.asarray(slot, dtype=jnp.uint32))
    r0, r1 = threefry2x32(c0, c1, jnp.uint32(seed), jnp.uint32(0x85EBCA6B))
    tof = lambda bits: (((bits >> jnp.uint32(9)) | jnp.uint32(0x3F800000))
                        .view(jnp.float32) - 1.0)
    return tof(r0), tof(r1)


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
