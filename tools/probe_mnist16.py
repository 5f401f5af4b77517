#!/usr/bin/env python
"""Standalone MNIST-2FC stage at 16 limbs with HBM telemetry.

Isolates the bench OOM: does the 16-limb transcipher->2FC pipeline fit a
fresh chip, and where does memory go?  HHE_PROBE_LIMBS / HHE_PROBE_B
override the chain width and batch.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()

from hhe_tpu.models import loaders, pocketnn
from hhe_tpu.ops import bfv, helin, pasta
from hhe_tpu.workloads import hhe_inference as hi


def mem(tag):
    st = jax.devices()[0].memory_stats() or {}
    used = st.get("bytes_in_use", 0) / 1e9
    peak = st.get("peak_bytes_in_use", 0) / 1e9
    print(f"[mem] {tag}: in_use={used:.2f} GB peak={peak:.2f} GB", flush=True)


def main():
    limbs = int(os.environ.get("HHE_PROBE_LIMBS", "16"))
    B = int(os.environ.get("HHE_PROBE_B", "2"))
    t0 = time.time()
    stack = hi.build_stack(
        bfv.BFVParams(n=16384, data_limbs=limbs, seed=1),
        input_len=784,
        device_keygen=True,
        seed=1,
    )
    print(f"stack built ({time.time()-t0:.0f}s)", flush=True)
    mem("stack")
    ctx = stack.ctx
    key = pasta.get_fixed_symmetric_key()
    enc_key = stack.tc.encrypt_key(stack.pk, key)
    cipher = pasta.Pasta(key, ctx.t)

    w1 = pocketnn.read_csv_matrix(
        "/root/reference/weights/mnist/qat/"
        "quant_2fc_2bits_mnist_plain_2bits_weights_fc1.csv"
    )
    w2 = pocketnn.read_csv_matrix(
        "/root/reference/weights/mnist/qat/"
        "quant_2fc_2bits_mnist_plain_2bits_weights_fc2.csv"
    )
    x_img, y = loaders.load_mnist_test(limit=B)
    samples = np.asarray(x_img, np.int64)
    w1_cts = helin.encrypt_weight(ctx, stack.pk, np.asarray(w1, np.int64).T)
    mem("weights encrypted")
    nonce = 51_000
    sym = cipher.encrypt(samples.astype(np.uint64), nonce=nonce)
    t0 = time.time()
    data_ct = hi.csp_decompose(stack, enc_key, sym, nonce=nonce)
    np.asarray(data_ct.data[0][..., 0, :4])
    print(f"decompose done ({time.time()-t0:.0f}s)", flush=True)
    mem("decompose")
    stack.tc.clear_caches()
    t0 = time.time()
    logits_ct = hi.csp_eval_2fc(
        stack, data_ct, w1_cts, np.asarray(w2, np.int64), row_chunk=8
    )
    np.asarray(logits_ct.data[0][..., 0, :4])
    print(f"2fc eval done ({time.time()-t0:.0f}s)", flush=True)
    mem("2fc")
    logits = hi.decrypt_2fc_logits(stack, logits_ct)
    t = ctx.t
    v1 = (samples @ np.asarray(w1, np.int64)) % t
    expect = ((v1 * v1) % t @ np.asarray(w2, np.int64)) % t
    expect = np.where(expect > t // 2, expect - t, expect)
    ok = np.array_equal(logits.astype(np.int64), expect)
    print(f"parity: {ok}", flush=True)
    print(f"acc on {B}: {float(np.mean(logits.argmax(1) == np.asarray(y)[:B]))}", flush=True)
    if not ok:
        print("logits:", logits[:2], "expect:", expect[:2], flush=True)


if __name__ == "__main__":
    main()
