#!/usr/bin/env python
"""Headline benchmark: the BASELINE.md north-star metric set.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"} with the
full metric set in "detail".

Headline = **batch-amortized PASTA->BFV transcipher throughput** at the
reference's production parameters (BFV N=16384, t=65537 — reference
``configs/config.cpp:15-21``). The keystream ciphertext depends only on
(key, nonce, block), so transciphering a B-sample batch costs ~one
homomorphic keystream evaluation + B cheap negate/add_plain ops — the
design's headline win over the reference's per-record loop
(``CSP.cpp:247-252``). Measured honestly: every rep uses a FRESH nonce (no
cache reuse across reps) and every result is materialized.

detail also carries:
- transcipher samples/s at B in {1, 16, 64} and the single-block latency
  (sync + pipelined)
- encrypted MNIST 2FC (784->128->square->10, shipped QAT weights)
  inferences/s — the reference's fc2 TODO completed homomorphically
  (``hhe_pktnn_examples.cpp:993-997``)
- NTT throughput in butterflies/s/chip for the production forward NTT

vs_baseline note: the baseline (BASELINE.md) is the reference C++
single-threaded *sequential* per-block decomposition time (22.66 s,
measured locally via tools/ref_bench); our number is batch-amortized device
throughput at B=64 — throughput-vs-throughput, since the sequential loop IS
the reference's batch story (one block at a time).
"""

import json
import math
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


def _log(msg):
    print(f"[bench] {msg}", file=sys.stderr, flush=True)


def _time_decompose(stack, enc_key, cipher, data, nonce, reps):
    """Wall time per call of a full CSP-side decompose. Each rep uses a
    FRESH nonce (defeats the keystream/round-material caches — the per-rep
    homomorphic work is the full transcipher) with the symmetric encryption
    done OUTSIDE the timed region (user-side cost, not CSP cost). A slice of
    every result is materialized so each execution provably ran."""
    from hhe_tpu.workloads import hhe_inference as hi

    ts = []
    for r in range(reps):
        sym = cipher.encrypt(data, nonce=nonce)
        t0 = time.time()
        out = hi.csp_decompose(stack, enc_key, sym, nonce=nonce)
        np.asarray(out.data[0][..., 0, :4])
        ts.append(time.time() - t0)
        nonce += 1
    return min(ts), nonce


def main():
    n = int(os.environ.get("BENCH_N", "16384"))
    limbs = {2048: 4, 4096: 4, 8192: 7, 16384: 13}.get(n, 13)
    reps = int(os.environ.get("BENCH_REPS", "3"))
    mnist_b = int(os.environ.get("BENCH_MNIST_B", "2"))

    import jax

    from hhe_tpu.models import loaders, pocketnn
    from hhe_tpu.ops import bfv, ntt, pasta, transcipher
    from hhe_tpu.workloads import hhe_inference as hi

    detail = {"n": n, "limbs": limbs, "device": str(jax.devices()[0])}

    # ---- setup: one stack with every key the protocol needs (device keygen)
    _log("setup: building stack (device keygen)")
    t0 = time.time()
    stack = hi.build_stack(
        bfv.BFVParams(n=n, data_limbs=limbs, seed=1),
        input_len=784,
        device_keygen=True,
        seed=1,
    )
    key = pasta.get_fixed_symmetric_key()
    enc_key = stack.tc.encrypt_key(stack.pk, key)
    detail["setup_s"] = round(time.time() - t0, 1)

    # ---- transcipher throughput, batch-amortized (ECG-shaped 128-len rows)
    rng = np.random.default_rng(0)
    cipher = pasta.Pasta(key, stack.ctx.t)
    nonce = 50_000  # far from any cached nonce
    tput = {}
    t0 = time.time()
    for b_sz in (1, 16, 64):
        _log(f"transcipher throughput: B={b_sz} warmup")
        data = rng.integers(0, stack.ctx.t, (b_sz, transcipher.T), np.uint64)
        # warmup/compile for this batch shape (fresh nonce so timed reps
        # can't hit its caches)
        _, nonce = _time_decompose(stack, enc_key, cipher, data, nonce, 1)
        _log(f"transcipher throughput: B={b_sz} timing")
        dt, nonce = _time_decompose(stack, enc_key, cipher, data, nonce, reps)
        tput[b_sz] = b_sz / dt
    detail["samples_per_s_by_batch"] = {k: round(v, 3) for k, v in tput.items()}
    detail["tput_bench_s"] = round(time.time() - t0, 1)

    # single-block latency, sync per call (includes the tunnel round trip)
    _log("single-block sync latency")
    mats_pt, rcs_pt = stack.tc.device_block_plaintexts(pasta.NONCE, 0)
    out = stack.tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, stack.tc._keys())
    np.asarray(out[0, 0, :4])
    t0 = time.time()
    for _ in range(reps):
        out = stack.tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, stack.tc._keys())
        np.asarray(out[0, 0, :4])
    detail["block_ms_sync"] = round((time.time() - t0) / reps * 1e3, 2)

    # ---- NTT butterflies/s/chip (production forward NTT, batch of polys)
    _log("NTT microbench")
    import jax.numpy as jnp

    X = 32
    x = jnp.asarray(
        rng.integers(0, 1 << 30, (X, limbs, n), np.int64).astype(np.uint32)
    )

    # chain K transforms inside one dispatch (output feeds input, so XLA
    # can't elide any), then slope between K=4 and K=20 cancels the fixed
    # dispatch + tunnel-sync overhead
    def chain(k_iters):
        def body(_, v):
            return ntt.ntt_fwd(v, stack.ctx.tb_q)

        return jax.jit(lambda v: jax.lax.fori_loop(0, k_iters, body, v))

    f4, f20 = chain(4), chain(20)
    np.asarray(f4(x)[0, 0, :4])  # compile
    np.asarray(f20(x)[0, 0, :4])

    def best(fn, reps_=3):
        ts = []
        for _ in range(reps_):
            t0 = time.time()
            np.asarray(fn(x)[0, 0, :4])
            ts.append(time.time() - t0)
        return min(ts)

    ntt_s = (best(f20) - best(f4)) / 16  # per forward NTT of [X, limbs, N]
    butterflies = X * limbs * (n // 2) * int(math.log2(n))
    detail["ntt_butterflies_per_s"] = round(butterflies / max(ntt_s, 1e-9), 0)
    detail["ntt_ms"] = round(ntt_s * 1e3, 3)

    # ---- encrypted MNIST 2FC inferences/s (shipped QAT weights; timed work
    # is the per-inference CSP pipeline: transcipher 7 blocks + flatten +
    # fc1 ctxct + square + fc2; weight encryption is one-time analyst setup)
    try:
        from hhe_tpu.ops import helin

        _log("MNIST 2FC")
        stack.tc.clear_caches()  # free ~2 GB of ECG-phase round material
        ctx = stack.ctx
        w1 = pocketnn.read_csv_matrix(
            "/root/reference/weights/mnist/qat/"
            "quant_2fc_2bits_mnist_plain_2bits_weights_fc1.csv"
        )
        w2 = pocketnn.read_csv_matrix(
            "/root/reference/weights/mnist/qat/"
            "quant_2fc_2bits_mnist_plain_2bits_weights_fc2.csv"
        )
        x_img, y = loaders.load_mnist_test(limit=mnist_b)
        samples = np.asarray(x_img, np.int64)
        w1_cts = helin.encrypt_weight(ctx, stack.pk, np.asarray(w1, np.int64).T)
        m_nonce = nonce + 1000
        sym = cipher.encrypt(samples.astype(np.uint64), nonce=m_nonce)
        t0 = time.time()
        data_ct = hi.csp_decompose(stack, enc_key, sym, nonce=m_nonce)
        logits_ct = hi.csp_eval_2fc(
            stack, data_ct, w1_cts, np.asarray(w2, np.int64), row_chunk=32
        )
        np.asarray(logits_ct.data[0][..., 0, :4])
        mnist_s = time.time() - t0
        # parity vs plaintext mod-t (outside the timed region)
        logits = hi.decrypt_2fc_logits(stack, logits_ct)
        t = ctx.t
        v1 = (samples @ np.asarray(w1, np.int64)) % t
        expect = ((v1 * v1) % t @ np.asarray(w2, np.int64)) % t
        expect = np.where(expect > t // 2, expect - t, expect)
        assert np.array_equal(logits.astype(np.int64), expect), "2FC parity"
        detail["mnist_2fc_inferences_per_s"] = round(mnist_b / mnist_s, 4)
        detail["mnist_2fc_batch"] = mnist_b
        detail["mnist_2fc_parity"] = "ok"
        detail["mnist_2fc_accuracy"] = float(
            np.mean(logits.argmax(1) == np.asarray(y)[:mnist_b])
        )
    except Exception as e:  # pragma: no cover - report, don't die
        detail["mnist_2fc_error"] = f"{type(e).__name__}: {e}"[:200]

    value = tput[64]
    vs = value * BASELINE_BLOCK_S if BASELINE_BLOCK_S > 0 else 0.0
    detail["baseline_block_s"] = BASELINE_BLOCK_S
    detail["baseline_note"] = (
        "baseline = reference C++ sequential per-block CPU time; value = "
        "batch-amortized device throughput at B=64 (keystream reuse)"
    )
    print(
        json.dumps(
            {
                "metric": "pasta_bfv_transcipher_samples_per_s_batch64",
                "value": round(value, 4),
                "unit": "samples/s",
                "vs_baseline": round(vs, 3),
                "detail": detail,
            }
        )
    )


if __name__ == "__main__":
    main()
