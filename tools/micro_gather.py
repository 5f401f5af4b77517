#!/usr/bin/env python
"""Separate gather cost vs multiply cost in the babystep hot loop."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()
import jax.numpy as jnp

from hhe_tpu.ops import modular
from hhe_tpu.ops.modular import add_mod, mont_mul, mul32_wide


def timeit(fn, *args, reps=20, warmup=3):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    k, kp, n = 13, 14, 16384
    rng = np.random.default_rng(0)
    q_host = np.full((kp, 1), (1 << 30) + 2**18 + 1, np.uint32)
    fd = jnp.asarray(rng.integers(0, 1 << 30, (k, kp, n), dtype=np.int64).astype(np.uint32))
    k0 = jnp.asarray(rng.integers(0, 1 << 30, (k, kp, n), dtype=np.int64).astype(np.uint32))
    k1 = jnp.asarray(rng.integers(0, 1 << 30, (k, kp, n), dtype=np.int64).astype(np.uint32))
    src = jnp.asarray(rng.permutation(n))
    q = jnp.asarray(q_host)
    qi = jnp.asarray(np.full((kp, 1), 123456789, np.uint32))
    small = jnp.asarray(rng.integers(0, 1 << 30, (kp, n), dtype=np.int64).astype(np.uint32))

    f_take_big = jax.jit(lambda x: jnp.take(x, src, axis=-1))
    f_take_small = jax.jit(lambda x: jnp.take(x, src, axis=-1))

    def ks_pair(fd):
        t0 = mont_mul(fd, k0, q, qi)
        t1 = mont_mul(fd, k1, q, qi)
        acc0, acc1 = t0[0], t1[0]
        for j in range(1, k):
            acc0 = add_mod(acc0, t0[j], q)
            acc1 = add_mod(acc1, t1[j], q)
        return acc0, acc1

    def ks_lazy(fd):
        """Lazy (hi,lo) accumulation: one reduction per output element."""
        out = []
        for kk in (k0, k1):
            hi, lo = mul32_wide(fd[0], kk[0])
            hi2 = jnp.zeros_like(hi)
            for j in range(1, k):
                h, l = mul32_wide(fd[j], kk[j])
                lo = lo + l
                c = (lo < l).astype(jnp.uint32)
                hi_n = hi + h + c
                hi2 = hi2 + (hi_n < h).astype(jnp.uint32)
                hi = hi_n
            # reduce 96-bit (hi2,hi,lo) mod q via Montgomery-ish: fold hi2,hi
            # r64 = 2^64 mod q precomputed; here approximate with two mont_muls
            r = mont_mul(hi, small[:, :1], q, qi)  # placeholder cost model
            r = add_mod(r, mont_mul(hi2, small[:, :1], q, qi), q)
            m = lo * qi
            mhi, _ = mul32_wide(m, q)
            r = add_mod(r, mhi, q)
            out.append(r)
        return tuple(out)

    f_ks = jax.jit(ks_pair)
    f_lazy = jax.jit(ks_lazy)
    f_mm_small = jax.jit(lambda x: mont_mul(x, small, q, qi))

    print(f"take [13,14,N]  (3.0M)  {timeit(f_take_big, fd)*1e3:7.3f} ms")
    print(f"take [14,N]     (0.2M)  {timeit(f_take_small, small)*1e3:7.3f} ms")
    print(f"ks mont pair [13,14,N]  {timeit(f_ks, fd)*1e3:7.3f} ms")
    print(f"ks lazy pair [13,14,N]  {timeit(f_lazy, fd)*1e3:7.3f} ms")
    print(f"mont_mul [14,N]         {timeit(f_mm_small, small)*1e3:7.3f} ms")


if __name__ == "__main__":
    main()
