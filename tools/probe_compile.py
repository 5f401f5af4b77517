#!/usr/bin/env python
"""Where does compile time go? Splits jit cost into trace+lower (Python/XLA
HLO building) vs backend compile, and checks persistent-cache behavior on
the axon TPU backend, for the two setup-dominating graphs (keygen `gen` and
`_jit_keystream`)."""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()
jax.config.update("jax_explain_cache_misses", True)

T0 = time.time()


def mark(msg):
    print(f"[{time.time()-T0:7.1f}s] {msg}", flush=True)


def main():
    from hhe_tpu.ops import bfv, pasta, transcipher

    ctx = bfv.Context(bfv.BFVParams(n=16384, data_limbs=13, seed=1))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    elts = transcipher.galois_elts(ctx, True)
    mark("context ready")
    rk, gks = ctx.keygen_eval_keys_device(sk, elts, include_relin=True, seed=1)
    jax.block_until_ready(rk.k0)
    mark(f"keygen done ({len(elts)} elts)")
    tc = transcipher.Transcipher(ctx, rk, gks)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)
    jax.block_until_ready(mats_pt)
    mark("transcipher + block material ready")

    f = jax.jit(tc._keystream_impl)
    t0 = time.time()
    lowered = f.lower(enc_key.data, mats_pt, rcs_pt, tc._keys())
    mark(f"keystream trace+lower: {time.time()-t0:.1f}s")
    t0 = time.time()
    compiled = lowered.compile()
    mark(f"keystream backend compile: {time.time()-t0:.1f}s")
    out = compiled(enc_key.data, mats_pt, rcs_pt, tc._keys())
    np.asarray(out[0, 0, :4])
    mark("keystream run")


if __name__ == "__main__":
    main()
