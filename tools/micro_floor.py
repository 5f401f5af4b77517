#!/usr/bin/env python
"""Isolate scan-iteration overhead vs real op throughput, and measure the
batched-babystep formulations that would replace the sequential scans."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()
import jax.numpy as jnp
from jax import lax

from hhe_tpu.ops import bfv, ntt, ntt_mxu
from hhe_tpu.ops.modular import add_mod, mont_mul

def bench(run, x, reps=3):
    out = run(x)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = run(x)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def chain_scan(op, x, R):
    @jax.jit
    def run(x):
        def body(c, _):
            return op(c), None
        out, _ = lax.scan(body, x, None, length=R)
        return out
    return bench(run, x) / R


def chain_unroll(op, x, R):
    @jax.jit
    def run(x):
        for _ in range(R):
            x = op(x)
        return x
    return bench(run, x) / R


def main():
    n = 16384
    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=13, seed=1))
    k = ctx.k
    rng = np.random.default_rng(0)

    def u32(shape, hi=1 << 30):
        return jnp.asarray(rng.integers(0, hi, shape, dtype=np.int64).astype(np.uint32))

    x_qp = u32((k + 1, n))
    fd = u32((k, k + 1, n))
    q, qi = ctx.tb_qp.q, ctx.tb_qp.qinv_neg
    one = jnp.asarray(np.uint32(1))

    add_small = lambda c: add_mod(c, one, q)
    print("trivial add [14,N]:")
    print(f"  scan R=20    {chain_scan(add_small, x_qp, 20)*1e3:8.3f} ms/iter")
    print(f"  scan R=100   {chain_scan(add_small, x_qp, 100)*1e3:8.3f} ms/iter")
    print(f"  unroll R=20  {chain_unroll(add_small, x_qp, 20)*1e3:8.3f} ms/iter")
    print(f"  unroll R=100 {chain_unroll(add_small, x_qp, 100)*1e3:8.3f} ms/iter")

    mm = lambda c: mont_mul(c, x_qp, q, qi)
    print("mont_mul [14,N]:")
    print(f"  scan R=50    {chain_scan(mm, x_qp, 50)*1e3:8.3f} ms/iter")
    print(f"  unroll R=50  {chain_unroll(mm, x_qp, 50)*1e3:8.3f} ms/iter")

    mm_big = lambda c: mont_mul(c, fd, q, qi)
    print("mont_mul [13,14,N] (3M el):")
    print(f"  unroll R=20  {chain_unroll(mm_big, fd, 20)*1e3:8.3f} ms/iter")

    # batched babystep formulation: B[j] = sum_d fd[d] * K'[j,d]  (j=15)
    J = 15
    kp0 = u32((J, k, k + 1, n))
    @jax.jit
    def batched_B(fd):
        t = mont_mul(fd[None], kp0, q, qi)  # [J, k, 14, N]
        return t.sum(1, dtype=jnp.uint64)  # lazy sum then fold (approx cost)
    tB = bench(batched_B, fd)
    print(f"batched B products [15x13x14,N] (45M mont_mul + sum): {tB*1e3:8.3f} ms")

    @jax.jit
    def batched_B_mod(fd):
        t = mont_mul(fd[None], kp0, q, qi)
        a = t[:, 0]
        for j in range(1, k):
            a = add_mod(a, t[:, j], q)
        return a
    tB2 = bench(batched_B_mod, fd)
    print(f"batched B products (add_mod tree):                    {tB2*1e3:8.3f} ms")

    # batched gather: [15,14,N] with 15 different perms
    srcs = jnp.asarray(np.stack([rng.permutation(n) for _ in range(J)]))
    h = u32((J, k + 1, n))
    @jax.jit
    def batched_perm(h):
        return jnp.take_along_axis(h, srcs[:, None, :].repeat(k + 1, 1), axis=-1)
    tg = bench(batched_perm, h)
    print(f"batched perm [15,14,N] take_along_axis:               {tg*1e3:8.3f} ms")

    @jax.jit
    def batched_perm2(h):
        return jax.vmap(lambda hh, ss: jnp.take(hh, ss, axis=-1))(h, srcs)
    tg2 = bench(batched_perm2, h)
    print(f"batched perm [15,14,N] vmap take:                     {tg2*1e3:8.3f} ms")

    # one-hot matmul permutation on MXU: perm as [N,N] would be too big;
    # but block-local perms? skip. Instead measure gather [16,13,N]:
    f016 = u32((16, k, n))
    srcs16 = jnp.asarray(np.stack([rng.permutation(n) for _ in range(16)]))
    @jax.jit
    def batched_perm16(h):
        return jax.vmap(lambda hh, ss: jnp.take(hh, ss, axis=-1))(h, srcs16)
    print(f"batched perm [16,13,N] vmap take:                     {bench(batched_perm16, f016)*1e3:8.3f} ms")

    # MXU NTT at hoist shape [13,14,N]
    tbm_qp = ntt_mxu.build_tables(ctx.base_qp.moduli, n)
    f_mxu = jax.jit(lambda c: ntt_mxu.ntt_fwd(c, tbm_qp))
    f_bfly = jax.jit(lambda c: ntt.ntt_fwd(c, ctx.tb_qp))
    print(f"ntt_fwd butterfly [13,14,N]:                          {bench(f_bfly, fd)*1e3:8.3f} ms")
    print(f"ntt_fwd MXU       [13,14,N]:                          {bench(f_mxu, fd)*1e3:8.3f} ms")
    f_mxui = jax.jit(lambda c: ntt_mxu.ntt_inv(c, tbm_qp))
    f_bflyi = jax.jit(lambda c: ntt.ntt_inv(c, ctx.tb_qp))
    print(f"ntt_inv butterfly [13,14,N]:                          {bench(f_bflyi, fd)*1e3:8.3f} ms")
    print(f"ntt_inv MXU       [13,14,N]:                          {bench(f_mxui, fd)*1e3:8.3f} ms")
    x8 = u32((8, k + 1, n))
    print(f"ntt_inv butterfly [8,14,N]:                           {bench(jax.jit(lambda c: ntt.ntt_inv(c, ctx.tb_qp)), x8)*1e3:8.3f} ms")
    print(f"ntt_inv MXU       [8,14,N]:                           {bench(jax.jit(lambda c: ntt_mxu.ntt_inv(c, tbm_qp)), x8)*1e3:8.3f} ms")


if __name__ == "__main__":
    main()
