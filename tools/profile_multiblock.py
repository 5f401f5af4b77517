#!/usr/bin/env python
"""Measure vmapped multi-block keystream throughput vs single-block.

If evaluating B blocks in ONE program takes < B x single-block time, the
batched path is the better serving configuration (and bench headline).
"""

import os
import sys
import time

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from hhe_tpu.ops import bfv, pasta, transcipher


def main():
    n = int(os.environ.get("BENCH_N", "16384"))
    limbs = {4096: 4, 8192: 7, 16384: 13}.get(n, 13)
    B = int(os.environ.get("NBLOCKS", "4"))
    reps = int(os.environ.get("REPS", "4"))

    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=limbs, seed=1))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    rk, gks = ctx.keygen_eval_keys_device(
        sk, transcipher.galois_elts(ctx), include_relin=True, seed=1
    )
    tc = transcipher.Transcipher(ctx, rk, gks)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)

    mats, rcs = zip(*(tc.device_block_plaintexts(pasta.NONCE, b) for b in range(B)))
    mats_st = jax.tree_util.tree_map(lambda *xs: jnp.stack(xs), *mats)
    rcs_st = jnp.stack(rcs)
    jax.block_until_ready(rcs_st)

    # compile both programs
    t0 = time.time()
    out1 = tc._jit_keystream(enc_key.data, mats[0], rcs[0], tc._keys())
    jax.block_until_ready(out1)
    print(f"single-block compile+run: {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    outB = tc._jit_keystream_blocks(enc_key.data, mats_st, rcs_st, tc._keys())
    jax.block_until_ready(outB)
    print(f"{B}-block compile+run: {time.time()-t0:.1f}s", flush=True)

    # pipelined throughput, all results materialized
    t0 = time.time()
    outs = [tc._jit_keystream(enc_key.data, mats[0], rcs[0], tc._keys()) for _ in range(reps)]
    for o in outs:
        np.asarray(o[0, 0, :4])
    per1 = (time.time() - t0) / reps
    print(f"single-block pipelined: {per1*1e3:.1f} ms/block", flush=True)

    t0 = time.time()
    outs = [
        tc._jit_keystream_blocks(enc_key.data, mats_st, rcs_st, tc._keys())
        for _ in range(reps)
    ]
    for o in outs:
        np.asarray(o[0, 0, 0, :4])
    perB = (time.time() - t0) / (reps * B)
    print(f"{B}-block pipelined: {perB*1e3:.1f} ms/block ({per1/perB:.2f}x)", flush=True)

    # parity of the batched path
    got = ctx.decode(ctx.decrypt(sk, bfv.Ciphertext(np.asarray(outs[-1][1]))))
    expect = pasta.keystream(key, ctx.t, pasta.NONCE, 1)
    print("batched block-1 parity:", np.array_equal(got[: transcipher.T], expect), flush=True)


if __name__ == "__main__":
    main()
