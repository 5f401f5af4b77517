#!/usr/bin/env python
"""Definitive per-op costs: slope of total time vs chained repetition count.

per_op = (T(R2) - T(R1)) / (R2 - R1) eliminates per-call/tunnel overhead.
"""

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

from hhe_tpu.ops import bfv, bfv_eval, ntt, ntt_mxu
from hhe_tpu.ops.modular import add_mod, mont_mul

R1, R2 = 4, 12


def slope(op, x, reps=4):
    def total(R):
        @jax.jit
        def run(x):
            def body(c, _):
                return op(c), None
            out, _ = lax.scan(body, x, None, length=R)
            return out

        out = run(x)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(reps):
            out = run(x)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / reps

    return (total(R2) - total(R1)) / (R2 - R1)


def main():
    n = 16384
    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=13, seed=1))
    k = ctx.k
    rng = np.random.default_rng(0)

    def u32(shape, hi=1 << 30):
        return jnp.asarray(rng.integers(0, hi, shape, dtype=np.int64).astype(np.uint32))

    x_q = u32((k, n))
    x_qp = u32((k + 1, n))
    fd = u32((k, k + 1, n))
    q, qi = ctx.tb_qp.q, ctx.tb_qp.qinv_neg
    qq, qqi = ctx.tb_q.q, ctx.tb_q.qinv_neg
    one = jnp.asarray(np.uint32(1))
    J = 15
    kp0 = u32((J, k, k + 1, n))
    kp1 = u32((J, k, k + 1, n))
    srcs = jnp.asarray(np.stack([rng.permutation(n) for _ in range(J)]))
    srcs16 = jnp.asarray(np.stack([rng.permutation(n) for _ in range(16)]))
    src1 = jnp.asarray(rng.permutation(n))
    dqp = u32((8, J, k + 1, n))
    tbm_qp = ntt_mxu.build_tables(ctx.base_qp.moduli, n)

    def ks_pair(f):
        t0 = mont_mul(f, kp0[0], q, qi)
        t1 = mont_mul(f, kp1[0], q, qi)
        a0, a1 = t0[0], t1[0]
        for j in range(1, k):
            a0 = add_mod(a0, t0[j], q)
            a1 = add_mod(a1, t1[j], q)
        return jnp.concatenate([a0[None], a1[None], f[2:]], 0)

    def batched_B(f):
        # [J,k,14,N] products, tree-summed over k -> [J,14,N] x2, stuffed back
        t0 = mont_mul(f[None], kp0, q, qi)
        t1 = mont_mul(f[None], kp1, q, qi)
        a0, a1 = t0[:, 0], t1[:, 0]
        for j in range(1, k):
            a0 = add_mod(a0, t0[:, j], q)
            a1 = add_mod(a1, t1[:, j], q)
        out = jnp.concatenate([a0[:k // 2], a1[: k - k // 2]], 0)  # [13,14,N]
        return out

    def batched_perm15(f):
        h = f[:J, :, :]  # [15,14,N]
        g = jax.vmap(lambda hh, ss: jnp.take(hh, ss, axis=-1))(h, srcs)
        return jnp.concatenate([g, f[J:]], 0)

    def horner_perm(f):
        # sequential accumulate with ONE fixed perm: 15 steps of take+add
        acc = f[0]
        for j in range(1, J):
            acc = add_mod(jnp.take(acc, src1, axis=-1), f[j], q)
        return jnp.concatenate([acc[None].repeat(J, 0), f[J:]], 0)

    def dmult_sum(f):
        # [8,J,14,N] * broadcast [J,14,N] -> sum over J -> [8,14,N]
        h = f[:J]
        t = mont_mul(h[None], dqp, q, qi)
        a = t[:, 0]
        for j in range(1, J):
            a = add_mod(a, t[:, j], q)
        return jnp.concatenate([a, a[:5], f[0][None]], 0)

    tests = [
        ("trivial add [14,N]", lambda c: add_mod(c, one, q), x_qp),
        ("mont_mul [13,14,N]", lambda c: mont_mul(c, fd, q, qi), fd),
        ("take [13,14,N]", lambda c: jnp.take(c, src1, axis=-1), fd),
        ("ks_pair [13,14,N]", ks_pair, fd),
        ("batched_B J=15", batched_B, fd),
        ("batched perm15 [15,14,N]", batched_perm15, fd),
        ("horner 15x(take+add) [14,N]", horner_perm, fd),
        ("dmult_sum [8,15,14,N]", dmult_sum, fd),
        ("ntt_fwd qp [13,14,N]", lambda c: ntt.ntt_fwd(c, ctx.tb_qp), fd),
        ("ntt_inv qp [13,14,N]", lambda c: ntt.ntt_inv(c, ctx.tb_qp), fd),
        ("mxu_fwd qp [13,14,N]", lambda c: ntt_mxu.ntt_fwd(c, tbm_qp), fd),
        ("mxu_inv qp [13,14,N]", lambda c: ntt_mxu.ntt_inv(c, tbm_qp), fd),
    ]
    print(f"device={jax.devices()[0]}  slope R={R1}->{R2}", flush=True)
    for name, op, x in tests:
        try:
            t = slope(op, x)
            print(f"{name:30s} {t*1e3:8.3f} ms", flush=True)
        except Exception as e:  # noqa
            print(f"{name:30s} FAILED {type(e).__name__}: {str(e)[:120]}")


if __name__ == "__main__":
    main()
