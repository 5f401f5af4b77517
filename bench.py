#!/usr/bin/env python
"""Headline benchmark: PASTA->BFV transcipher throughput on production params.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.

The unit of work is one homomorphic PASTA-3 keystream-block evaluation
(= transciphering one 128-word sample, e.g. one ECG record) at the
reference's production parameters (BFV N=16384, t=65537 — reference
``configs/config.cpp:15-21``): 4 packed diagonal matmuls (127 rotations
each), 2 feistel squares, 1 cube, all under encryption.

vs_baseline compares against the reference C++ (SEAL 4.0, single-threaded)
decomposition time for the same block, measured locally when available
(see BASELINE.md); BASELINE_BLOCK_S holds the measured value.
"""

import json
import os
import pathlib
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

# Reference C++ (SEAL 4.0, this machine's CPU, single thread) seconds per
# decomposition block; measured via tools/ref_bench: 22.66 s/block at
# N=16384, t=65537 (parity OK). See BASELINE.md.
BASELINE_BLOCK_S = float(os.environ.get("HHE_BASELINE_BLOCK_S", "22.66"))

CACHE = pathlib.Path(__file__).resolve().parent / ".bench_cache"


def _get_stack(n, limbs):
    from hhe_tpu.ops import bfv, transcipher

    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=limbs, seed=1))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    # evaluation keys generated on-device (nothing large crosses the tunnel)
    rk, gks = ctx.keygen_eval_keys_device(
        sk, transcipher.galois_elts(ctx), include_relin=True, seed=1
    )
    tc = transcipher.Transcipher(ctx, rk, gks)
    return ctx, sk, pk, tc


def main():
    n = int(os.environ.get("BENCH_N", "16384"))
    limbs = {4096: 4, 8192: 7, 16384: 13}.get(n, 13)
    reps = int(os.environ.get("BENCH_REPS", "3"))

    import jax

    from hhe_tpu.ops import pasta

    t0 = time.time()
    ctx, sk, pk, tc = _get_stack(n, limbs)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    # round material: expanded on device from ~4 KB of SHAKE seeds, cached
    # per block (amortizes across every sample sharing the block)
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)
    jax.block_until_ready(mats_pt)
    setup_s = time.time() - t0

    # warmup / compile
    t0 = time.time()
    out = tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, tc._keys())
    jax.block_until_ready(out)
    compile_s = time.time() - t0

    # Latency: one block with a full host sync per call (includes the
    # tunnel's ~1s device->host round trip under axon).
    t0 = time.time()
    for _ in range(reps):
        out = tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, tc._keys())
        np.asarray(out[0, 0, :4])
    per_block_sync = (time.time() - t0) / reps

    # Throughput (the headline): enqueue `reps` independent evaluations,
    # then materialize a slice of EVERY result — each execution provably
    # completed (unconsumed results on lazy/remote backends may never run,
    # which would report fantasy numbers; consuming only the last has the
    # same flaw for the earlier reps).
    treps = max(reps, int(os.environ.get("BENCH_TREPS", "8")))
    outs = []
    t0 = time.time()
    for _ in range(treps):
        outs.append(tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, tc._keys()))
    for o in outs:
        np.asarray(o[0, 0, :4])
    per_block = (time.time() - t0) / treps

    value = 1.0 / per_block
    vs = value * BASELINE_BLOCK_S if BASELINE_BLOCK_S > 0 else 0.0
    print(
        json.dumps(
            {
                "metric": "pasta_bfv_transcipher_samples_per_s",
                "value": round(value, 4),
                "unit": "samples/s",
                "vs_baseline": round(vs, 3),
                "detail": {
                    "n": n,
                    "limbs": limbs,
                    "block_ms": round(per_block * 1e3, 2),
                    "block_ms_sync": round(per_block_sync * 1e3, 2),
                    "setup_s": round(setup_s, 1),
                    "compile_s": round(compile_s, 1),
                    "device": str(jax.devices()[0]),
                    "baseline_block_s": BASELINE_BLOCK_S,
                },
            }
        )
    )


if __name__ == "__main__":
    main()
