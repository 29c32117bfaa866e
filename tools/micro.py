"""Micro-benchmarks for VPU primitive cost theories (RNG ops, gathers)."""
import sys
import time

sys.path.insert(0, "/root/repo")

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, iters=30):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.time()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.time() - t0) / iters


R = 54000


def main():
    x = jnp.arange(R, dtype=jnp.uint32)
    xf = jnp.arange(R, dtype=jnp.float32)
    floor = timeit(jax.jit(lambda a: a + 1), xf)
    print(f"floor {floor*1e3:.2f} ms")

    def chain_add(a, n=200):
        for i in range(n):
            a = a + jnp.uint32(i + 1)
        return a
    print(f"u32 add x200   : {(timeit(jax.jit(chain_add), x)-floor)*1e3:7.2f} ms")

    def chain_shift(a, n=200):
        for i in range(n):
            a = (a << jnp.uint32(5)) | (a >> jnp.uint32(27))
        return a
    print(f"u32 rotl x200  : {(timeit(jax.jit(chain_shift), x)-floor)*1e3:7.2f} ms")

    def chain_xor(a, n=200):
        for i in range(n):
            a = a ^ (a + jnp.uint32(i))
        return a
    print(f"u32 xor+add200 : {(timeit(jax.jit(chain_xor), x)-floor)*1e3:7.2f} ms")

    def chain_fadd(a, n=200):
        for i in range(n):
            a = a * 1.0001 + 0.5
        return a
    print(f"f32 fma x200   : {(timeit(jax.jit(chain_fadd), xf)-floor)*1e3:7.2f} ms")

    from vpt_tpu.core import rng as RNG
    def bank6(p):
        return [RNG.uniform_float_pair(p, 3, 4 + 2 * k, 1301081)
                for k in range(6)]
    print(f"threefry bank6 : {(timeit(jax.jit(bank6), x)-floor)*1e3:7.2f} ms")

    def one_pair(p):
        return RNG.uniform_float_pair(p, 3, 4, 1301081)
    print(f"threefry pair1 : {(timeit(jax.jit(one_pair), x)-floor)*1e3:7.2f} ms")

    # vectorized bank: one threefry call on a (6, R) counter block
    def bank_vec(p):
        slots = jnp.arange(6, dtype=jnp.uint32)[:, None] * 2 + 4
        c0 = jnp.broadcast_to(p[None, :], (6, R))
        c1 = jnp.uint32(3) * jnp.uint32(0x01000193) + slots
        r0, r1 = RNG.threefry2x32(c0, jnp.broadcast_to(c1, (6, R)),
                                  jnp.uint32(1301081), jnp.uint32(0x85EBCA6B))
        tof = lambda b: (((b >> jnp.uint32(9)) | jnp.uint32(0x3F800000))
                         .view(jnp.float32) - 1.0)
        return tof(r0), tof(r1)
    print(f"threefry (6,R) : {(timeit(jax.jit(bank_vec), x)-floor)*1e3:7.2f} ms")

    # gathers at R from a (T, K) table
    T = 61446
    g = ((x * jnp.uint32(2654435761)) % T).astype(jnp.int32)
    for K in (4, 8, 16, 32):
        tab = jnp.arange(T * K, dtype=jnp.float32).reshape(T, K)
        dt = timeit(jax.jit(lambda gg, tb=tab: tb[gg]), g) - floor
        print(f"gather (T,{K:2d})  : {dt*1e3:7.2f} ms")
    # 3 separate row gathers vs one wide
    tab9 = jnp.arange(32682 * 9, dtype=jnp.float32).reshape(32682, 9)
    gv = (g % 32682)
    def g3(gg):
        return tab9[gg], tab9[(gg + 1) % 32682], tab9[(gg + 2) % 32682]
    print(f"gather (V,9)x3 : {(timeit(jax.jit(g3), gv)-floor)*1e3:7.2f} ms")
    # gather via take_along_axis one-hot? skip. sorted gather:
    gs = jnp.sort(g)
    tab16 = jnp.arange(T * 16, dtype=jnp.float32).reshape(T, 16)
    print(f"gather sorted16: {(timeit(jax.jit(lambda gg: tab16[gg]), gs)-floor)*1e3:7.2f} ms")

    # cumsum + argsort costs (for binning feasibility)
    keyb = (g % 64).astype(jnp.int32)
    print(f"argsort 54k    : {(timeit(jax.jit(lambda k: jnp.argsort(k)), keyb)-floor)*1e3:7.2f} ms")
    print(f"sortkv 54k     : {(timeit(jax.jit(lambda k: jax.lax.sort_key_val(k, x)[1]), keyb)-floor)*1e3:7.2f} ms")
    def rank_bins(k, B=64):
        oh = jax.nn.one_hot(k, B, dtype=jnp.int32)          # (R, B)
        within = jnp.cumsum(oh, axis=0) - oh                # exclusive
        counts = jnp.sum(oh, axis=0)
        offs = jnp.concatenate([jnp.zeros((1,), jnp.int32),
                                jnp.cumsum(counts)[:-1]])
        rank = jnp.sum(oh * (within + offs[None, :]), axis=1)
        return rank
    print(f"bin-rank B=64  : {(timeit(jax.jit(rank_bins), keyb)-floor)*1e3:7.2f} ms")
    # scatter cost: permute 12 floats by rank
    payload = jnp.arange(R * 12, dtype=jnp.float32).reshape(R, 12)
    rk = jax.jit(rank_bins)(keyb)
    def scat(p, r):
        return jnp.zeros_like(p).at[r].set(p)
    print(f"scatter (R,12) : {(timeit(jax.jit(scat), payload, rk)-floor)*1e3:7.2f} ms")
    def gath(p, r):
        return p[r]
    print(f"gather  (R,12) : {(timeit(jax.jit(gath), payload, rk)-floor)*1e3:7.2f} ms")


if __name__ == "__main__":
    main()
