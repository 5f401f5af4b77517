#!/usr/bin/env python
"""Phase-by-phase timing of the bench setup path (build_stack + encrypt_key
+ first keystream): identifies where BENCH_r03's 429 s of setup_s went so
bench.py can cut it (VERDICT round-3 item #1b).

Usage: python tools/probe_setup.py [--limbs 13]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()

T0 = time.time()


def mark(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    limbs = int(os.environ.get("PROBE_LIMBS", "13"))
    n = 16384
    from hhe_tpu.ops import bfv, helin, pasta, transcipher
    import math

    mark(f"imports done (device={jax.devices()[0]})")
    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=limbs, seed=1))
    mark("Context built")
    sk = ctx.keygen_secret()
    mark("keygen_secret")
    pk = ctx.keygen_public(sk)
    mark("keygen_public (host NTT mul)")
    input_len = 784
    num_blocks = math.ceil(input_len / transcipher.T)
    elts = set(transcipher.galois_elts(ctx, True))
    elts.update(helin.flatten_galois_elts(ctx, num_blocks, transcipher.T))
    elts.update(helin.vec_sum_galois_elts(ctx))
    mark(f"galois elt list ({len(elts)} elts)")
    rk, gks = ctx.keygen_eval_keys_device(sk, sorted(elts), include_relin=True, seed=1)
    jax.block_until_ready(rk.k0)
    mark("keygen_eval_keys_device (incl. gen jit compile)")
    tc = transcipher.Transcipher(ctx, rk, gks)
    jax.block_until_ready(tc.baby_k0)
    mark("Transcipher init (BSGS key stacks, perms)")
    csp_sk = ctx.keygen_secret()
    mark("csp keygen_secret")
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    mark("encrypt_key (host)")
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)
    jax.block_until_ready(mats_pt)
    mark("device_block_plaintexts (jit_expand compile + run)")
    out = tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, tc._keys())
    np.asarray(out[0, 0, :4])
    mark("first _jit_keystream (compile + run)")
    t0 = time.time()
    out = tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, tc._keys())
    np.asarray(out[0, 0, :4])
    mark(f"second _jit_keystream (steady state {time.time()-t0:.2f}s)")
    # the finish path (batched)
    rng = np.random.default_rng(0)
    chunk = jax.numpy.asarray(rng.integers(0, ctx.t, (64, 128), np.uint32))
    r = tc._jit_finish(out, chunk)
    np.asarray(r[0, 0, 0, :4])
    mark("first _jit_finish B=64 (compile + run)")


if __name__ == "__main__":
    main()
