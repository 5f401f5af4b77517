#!/usr/bin/env python
"""Steady-state per-op cost via scan-chained repetitions inside ONE jit.

Each op runs R times with a data dependency chain, so dispatch overhead
amortizes away and XLA cannot elide iterations.
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

from hhe_tpu.ops import bfv, bfv_eval, ntt, ntt_mxu, rns
from hhe_tpu.ops.modular import add_mod, mont_mul

R = 20


def chain(op, x, reps=3):
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
    return (time.perf_counter() - t0) / reps / R


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
    k0 = u32((k, k + 1, n))
    k1 = u32((k, k + 1, n))
    src = jnp.asarray(rng.permutation(n))
    tbm = ntt_mxu.build_tables(ctx.q_moduli, n)
    qp, qpi = ctx.tb_qp.q, ctx.tb_qp.qinv_neg

    def ks_pair(f):
        t0 = mont_mul(f, k0, qp, qpi)
        t1 = mont_mul(f, k1, qp, qpi)
        a0, a1 = t0[0], t1[0]
        for j in range(1, k):
            a0 = add_mod(a0, t0[j], qp)
            a1 = add_mod(a1, t1[j], qp)
        # keep chain shape: scatter the two results back into an fd-like array
        return f.at[0].set(a0[None].repeat(k, 0)[0][None].repeat(k, 0)) if False else jnp.concatenate([a0[None], a1[None], f[2:]], 0)

    tests = [
        ("ntt_fwd q [13,N]", lambda c: ntt.ntt_fwd(c, ctx.tb_q), x_q),
        ("ntt_inv q [13,N]", lambda c: ntt.ntt_inv(c, ctx.tb_q), x_q),
        ("ntt_fwd qp [14,N]", lambda c: ntt.ntt_fwd(c, ctx.tb_qp), x_qp),
        ("ntt_fwd qp [13,14,N]", lambda c: ntt.ntt_fwd(c, ctx.tb_qp), fd),
        ("mxu_fwd q [13,N]", lambda c: ntt_mxu.ntt_fwd(c, tbm), x_q),
        ("take perm [13,14,N]", lambda c: jnp.take(c, src, axis=-1), fd),
        ("take perm [14,N]", lambda c: jnp.take(c, src, axis=-1), x_qp),
        ("take perm [13,N]", lambda c: jnp.take(c, src, axis=-1), x_q),
        ("ks_pair [13,14,N]", ks_pair, fd),
        ("mont_mul [14,N]", lambda c: mont_mul(c, k0[0], qp, qpi), x_qp),
        ("mont_mul [13,14,N]", lambda c: mont_mul(c, k0, qp, qpi), fd),
        ("hoist digits+ntt", lambda c: bfv_eval.hoist_digits(ctx, c)[:, :-1, ::(k + 1)][..., :n].reshape(k, n) if False else bfv_eval.hoist_digits(ctx, c).sum(1).astype(jnp.uint32) % ctx.tb_q.q, x_q),
        ("mod_down [14,N]", lambda c: jnp.concatenate([bfv_eval.mod_down(ctx, c), c[-1:]], 0), x_qp),
    ]
    print(f"device={jax.devices()[0]}  chained R={R}")
    for name, op, x in tests:
        try:
            t = chain(op, x)
            print(f"{name:24s} {t*1e3:8.3f} ms")
        except Exception as e:  # noqa
            print(f"{name:24s} FAILED {type(e).__name__}: {e}")


if __name__ == "__main__":
    main()
