#!/usr/bin/env python
"""Microbenchmark the transcipher's building blocks on the real device.

Times, per op: butterfly NTT fwd/inv over q and qP, MXU NTT fwd, hoisted
key-switch digit products, hoist_digits, mod_down, the full BSGS matmul,
and the full keystream — so optimization effort goes where the time is.
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

from hhe_tpu.ops import bfv, bfv_eval, ntt, ntt_mxu, pasta, transcipher


def timeit(fn, *args, reps=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / reps


def main():
    n = int(os.environ.get("BENCH_N", "16384"))
    limbs = {4096: 4, 8192: 7, 16384: 13}.get(n, 13)
    print(f"device={jax.devices()[0]}  N={n} k={limbs}")

    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=limbs, seed=1))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    rk, gks = ctx.keygen_eval_keys_device(
        sk, transcipher.galois_elts(ctx), include_relin=True, seed=1
    )
    tc = transcipher.Transcipher(ctx, rk, gks)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)
    jax.block_until_ready(mats_pt)

    k, N = ctx.k, ctx.n
    rng = np.random.default_rng(0)
    x_q = jnp.asarray(
        rng.integers(0, 1 << 30, (k, N), dtype=np.int64).astype(np.uint32)
    )
    x_qp = jnp.asarray(
        rng.integers(0, 1 << 30, (k + 1, N), dtype=np.int64).astype(np.uint32)
    )
    x2_q = jnp.asarray(
        rng.integers(0, 1 << 30, (2, k, N), dtype=np.int64).astype(np.uint32)
    )

    f_ntt_q = jax.jit(lambda x: ntt.ntt_fwd(x, ctx.tb_q))
    f_ntt_qp = jax.jit(lambda x: ntt.ntt_fwd(x, ctx.tb_qp))
    f_intt_qp = jax.jit(lambda x: ntt.ntt_inv(x, ctx.tb_qp))
    tbm = ntt_mxu.build_tables(ctx.q_moduli, n)
    f_ntt_mxu = jax.jit(lambda x: ntt_mxu.ntt_fwd(x, tbm))

    f_hoist = jax.jit(lambda x: bfv_eval.hoist_digits(ctx, x))
    fd = f_hoist(x_q)
    ksk = gks[tc.g_neg1]
    f_ksprod = jax.jit(
        lambda fd: bfv_eval.hoisted_ks_products(ctx, fd, ksk)
    )
    f_moddown = jax.jit(lambda x: bfv_eval.mod_down(ctx, x))
    f_mm = jax.jit(
        lambda st, m, keys: tc._matmul(bfv.Ciphertext(st), m, keys).data
    )
    m0 = tc.round_mats(mats_pt, 0)

    print(f"ntt_fwd q   [k,N]      {timeit(f_ntt_q, x_q)*1e3:8.2f} ms")
    print(f"ntt_fwd qP  [k+1,N]    {timeit(f_ntt_qp, x_qp)*1e3:8.2f} ms")
    print(f"ntt_inv qP  [k+1,N]    {timeit(f_intt_qp, x_qp)*1e3:8.2f} ms")
    print(f"ntt_fwd MXU [k,N]      {timeit(f_ntt_mxu, x_q)*1e3:8.2f} ms")
    print(f"hoist_digits k->k,k+1  {timeit(f_hoist, x_q)*1e3:8.2f} ms")
    print(f"ks_products [k,k+1,N]  {timeit(f_ksprod, fd)*1e3:8.2f} ms")
    print(f"mod_down    [k+1,N]    {timeit(f_moddown, x_qp)*1e3:8.2f} ms")
    print(f"bsgs matmul (1 round)  {timeit(f_mm, x2_q, m0, tc._keys(), reps=3)*1e3:8.2f} ms")
    print(
        f"keystream (4 rounds)   "
        f"{timeit(tc._jit_keystream, enc_key.data, mats_pt, rcs_pt, tc._keys(), reps=3)*1e3:8.2f} ms"
    )


if __name__ == "__main__":
    main()
