#!/usr/bin/env python
"""Honest component profile of the keystream: matmul rounds vs sboxes.

Each measurement materializes a slice per rep (lazy backends may skip
unconsumed executions entirely).
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()

from hhe_tpu.ops import bfv, bfv_eval, pasta, transcipher


def timed(fn, *args, reps=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(reps):
        out = fn(*args)
        np.asarray(jax.tree_util.tree_leaves(out)[0]).ravel()[:4]
    return (time.perf_counter() - t0) / reps


def main():
    n = int(os.environ.get("BENCH_N", "16384"))
    n1 = int(os.environ.get("BENCH_N1", str(transcipher.BSGS_N1)))
    n2 = transcipher.T // n1
    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=13, seed=1))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    rk, gks = ctx.keygen_eval_keys_device(
        sk, transcipher.galois_elts(ctx, True, n1, n2), include_relin=True, seed=1
    )
    tc = transcipher.Transcipher(ctx, rk, gks, n1=n1, n2=n2)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)
    jax.block_until_ready(mats_pt)
    keys = tc._keys()
    print(f"device={jax.devices()[0]} N={n} n1={n1} n2={n2}", flush=True)

    f_mm = jax.jit(
        lambda st, m, keys: tc._matmul(bfv.Ciphertext(st), m, keys).data
    )
    m0 = tc.round_mats(mats_pt, 0)
    print(f"matmul (1 round):   {timed(f_mm, enc_key.data, m0, keys)*1e3:8.1f} ms", flush=True)

    f_feistel = jax.jit(lambda st, keys: tc._sbox_feistel(bfv.Ciphertext(st), keys).data)
    print(f"feistel sbox:       {timed(f_feistel, enc_key.data, keys)*1e3:8.1f} ms", flush=True)

    f_cube = jax.jit(
        lambda st, rk: bfv_eval.exponentiate(ctx, bfv.Ciphertext(st), 3, rk).data
    )
    print(f"cube sbox:          {timed(f_cube, enc_key.data, keys[0])*1e3:8.1f} ms", flush=True)

    f_mix = jax.jit(lambda st, keys: tc._mix(bfv.Ciphertext(st), keys).data)
    print(f"mix:                {timed(f_mix, enc_key.data, keys)*1e3:8.1f} ms", flush=True)

    print(
        f"full keystream:     "
        f"{timed(tc._jit_keystream, enc_key.data, mats_pt, rcs_pt, keys, reps=3)*1e3:8.1f} ms",
        flush=True,
    )


if __name__ == "__main__":
    main()
