#!/usr/bin/env python
"""Per-component cost of ONE BSGS matmul round at production params —
the round-3 verdict's item 3: the block runs at 3.8% of its own HBM
speed-of-light and the gap needs a measured per-op breakdown.

Slope method (chained reps inside one jit, slope between two rep counts)
so tunnel sync / dispatch cancels.  Every piece's output is folded back
into the carry so XLA cannot dead-code it.
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

from hhe_tpu.ops import bfv, bfv_eval, ntt, pasta, transcipher
from hhe_tpu.ops.modular import add_mod, mont_mul

# short chains: every (piece, R) pair is its own remote compile over the
# tunnel (~1-3 min each); R=1->4 keeps 2 compiles/piece small while the
# 3-rep delta still cancels dispatch+sync
R1, R2 = 1, 4


def slope(make_body, x, reps=3):
    def total(R):
        @jax.jit
        def run(x):
            def body(c, _):
                return make_body(c), None

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
    n = int(os.environ.get("BENCH_N", "16384"))
    limbs = 13
    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=limbs, seed=1))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    rk, gks = ctx.keygen_eval_keys_device(
        sk, transcipher.galois_elts(ctx, True), include_relin=True, seed=1
    )
    tc = transcipher.Transcipher(ctx, rk, gks)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)
    jax.block_until_ready(mats_pt)
    keys = tc._keys()
    m0 = tc.round_mats(mats_pt, 0)
    mats_q, mats_qp = m0
    st0 = jnp.asarray(enc_key.data)
    k, kd = ctx.k + 1, ctx.k
    q, qi = ctx.tb_q.q, ctx.tb_q.qinv_neg
    qp, qpi = ctx.tb_qp.q, ctx.tb_qp.qinv_neg
    n1, n2 = tc.n1, tc.n2
    baby_k0, baby_k1, baby_srcs = keys[4]
    giant_k0, giant_k1, giant_nsrc, giant_csrc, giant_csign = keys[5]
    baby_ps, giant_ps = keys[6]
    from hhe_tpu.ops import galois_mxu

    print(
        f"device={jax.devices()[0]} N={n} limbs={limbs} n1={n1} n2={n2} "
        f"mxu={tc.use_mxu_galois}",
        flush=True,
    )

    def fold(c, piece):  # fold arbitrary-shaped piece back into [2,k-1,N] carry
        flat = piece.reshape(-1)[: c[0].size].reshape(c[0].shape).astype(jnp.uint32)
        lim = jnp.minimum(flat, q[0] - 1)
        return jnp.stack([add_mod(c[0], lim, ctx.tb_q.q), c[1]])

    def p_full(c):
        return tc._matmul(bfv.Ciphertext(c), m0, keys).data

    def p_hoist(c):
        return fold(c, bfv_eval.hoist_digits(ctx, c[1]))

    def p_f01(c):
        return fold(c, ntt.ntt_fwd(c, ctx.tb_q))

    def contract(fdig_t, k0s, k1s):
        t0 = mont_mul(fdig_t[..., 0, :], k0s[..., 0, :], qp, qpi)
        t1 = mont_mul(fdig_t[..., 0, :], k1s[..., 0, :], qp, qpi)
        for d in range(1, ctx.k):
            t0 = add_mod(t0, mont_mul(fdig_t[..., d, :], k0s[..., d, :], qp, qpi), qp)
            t1 = add_mod(t1, mont_mul(fdig_t[..., d, :], k1s[..., d, :], qp, qpi), qp)
        return t0, t1

    fd0 = bfv_eval.hoist_digits(ctx, st0[1])
    fd0_t = jnp.swapaxes(fd0, -3, -2)
    f0_0 = ntt.ntt_fwd(st0[0], ctx.tb_q)

    def p_contract(c):
        fd_t = jnp.swapaxes(bfv_eval.hoist_digits(ctx, c[1]), -3, -2)
        b0, b1 = contract(fd_t, baby_k0, baby_k1)
        return fold(c, b0 + b1)

    def p_rotf0(c):
        f0 = ntt.ntt_fwd(c[0], ctx.tb_q)
        if tc.use_mxu_galois:
            r = galois_mxu.apply_broadcast(f0, baby_ps)
        else:
            r = jax.vmap(lambda x, s: jnp.take(x, s, axis=-1), (None, 0))(
                f0, baby_srcs
            )
        return fold(c, r)

    b0c, b1c = contract(fd0_t, baby_k0, baby_k1)

    def p_babyperm(c):
        x = b0c + c[0, 0, 0]  # make it carry-dependent
        if tc.use_mxu_galois:
            h = galois_mxu.apply_aligned(x, baby_ps.rows(slice(1, None)))
        else:
            h = jax.vmap(lambda a, s: jnp.take(a, s, axis=-1))(x, baby_srcs[1:])
        return fold(c, h)

    rot_f0c = (
        galois_mxu.apply_broadcast(f0_0, baby_ps)
        if tc.use_mxu_galois
        else jax.vmap(lambda x, s: jnp.take(x, s, axis=-1), (None, 0))(f0_0, baby_srcs)
    )
    dq = mats_q.reshape(n2, n1, ctx.k, ctx.n)
    dqp = mats_qp.reshape(n2, n1, ctx.k + 1, ctx.n)

    from hhe_tpu.ops.modular import tree_add_mod

    def p_qaccum(c):
        rf = rot_f0c + c[0, 0, 0]
        acc = tree_add_mod(mont_mul(rf[None], dq, q, qi), q, axis=1)[:, 0]
        return fold(c, acc)

    h0c = (
        galois_mxu.apply_aligned(b0c, baby_ps.rows(slice(1, None)))
        if tc.use_mxu_galois
        else jax.vmap(lambda a, s: jnp.take(a, s, axis=-1))(b0c, baby_srcs[1:])
    )

    def p_paccum(c):
        h = h0c + c[0, 0, 0]
        acc = tree_add_mod(mont_mul(h[None], dqp[:, 1:], qp, qpi), qp, axis=1)[:, 0]
        return fold(c, acc)

    acc0p_c = mont_mul(h0c[0][None], dqp[:, 1], qp, qpi)

    def p_invdown(c):
        a = acc0p_c + c[0, 0, 0]
        r = bfv_eval.mod_down(ctx, ntt.ntt_inv(a, ctx.tb_qp))
        return fold(c, r)

    def p_feistel(c):
        return tc._sbox_feistel(bfv.Ciphertext(c), keys).data

    def p_cube(c):
        return bfv_eval.exponentiate(ctx, bfv.Ciphertext(c), 3, keys[0]).data

    def p_mix(c):
        return tc._mix(bfv.Ciphertext(c), keys).data

    # NOTE: a chained FULL-matmul or baby-contract piece closes over the
    # [31, 14, 13, N] key stacks as scan constants and trips the tunnel's
    # remote-compile body limit (HTTP 413) — measure those via block_sync
    # instead (keys enter _jit_keystream as arguments there).
    tests = [
        ("q-part accum (tree)", p_qaccum),
        ("P-part accum (tree)", p_paccum),
        ("feistel sbox", p_feistel),
        ("cube sbox", p_cube),
        ("mix", p_mix),
        ("hoist_digits (digit NTT set)", p_hoist),
        ("ntt_inv + mod_down [4]", p_invdown),
        ("rot_f0 fan-out x32", p_rotf0),
        ("baby result permutes x31", p_babyperm),
    ]
    for name, op in tests:
        try:
            t = slope(op, st0)
            print(f"{name:32s} {t*1e3:8.2f} ms", flush=True)
        except Exception as e:  # noqa
            print(f"{name:32s} FAILED {type(e).__name__}: {str(e)[:140]}", flush=True)


if __name__ == "__main__":
    main()
