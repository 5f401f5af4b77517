#!/usr/bin/env python
"""Per-stage noise budgets of the transcipher->2FC pipeline at N=16384.

Diagnoses the bench MNIST-2FC parity failure: how many bits each stage
costs and what chain width the 2FC (decompose + fc1 ct-x-ct + square +
small-norm fc2) actually needs.  HHE_PROBE_LIMBS selects the chain.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax.numpy as jnp

from hhe_tpu.utils import cache as _cache

_cache.enable()

from hhe_tpu.models import loaders, pocketnn
from hhe_tpu.ops import bfv, bfv_eval, helin, pasta
from hhe_tpu.workloads import hhe_inference as hi


def main():
    n = 16384
    limbs = int(os.environ.get("HHE_PROBE_LIMBS", "13"))
    t0 = time.time()
    stack = hi.build_stack(
        bfv.BFVParams(n=n, data_limbs=limbs, seed=1),
        input_len=784,
        device_keygen=True,
        seed=1,
    )
    print(f"stack built: n={n} limbs={limbs} ({time.time()-t0:.0f}s)", flush=True)
    ctx = stack.ctx

    w1 = pocketnn.read_csv_matrix(
        "/root/reference/weights/mnist/qat/"
        "quant_2fc_2bits_mnist_plain_2bits_weights_fc1.csv"
    )
    w2 = pocketnn.read_csv_matrix(
        "/root/reference/weights/mnist/qat/"
        "quant_2fc_2bits_mnist_plain_2bits_weights_fc2.csv"
    )
    x_img, y = loaders.load_mnist_test(limit=1)
    samples = np.asarray(x_img, np.int64)

    key = pasta.get_fixed_symmetric_key()
    cipher = pasta.Pasta(key, ctx.t)
    enc_key = stack.tc.encrypt_key(stack.pk, key)
    nonce = 123123
    sym = cipher.encrypt(samples.astype(np.uint64), nonce=nonce)

    def budget(ct):
        d = np.asarray(ct.data)
        if d.ndim == 4:
            d = d[:, 0]
        return ctx.noise_budget(stack.sk, bfv.Ciphertext(jnp.asarray(d)))

    data_ct = hi.csp_decompose(stack, enc_key, sym, nonce=nonce)
    print(f"after decompose+flatten: {budget(data_ct)} bits", flush=True)

    w1_cts = helin.encrypt_weight(ctx, stack.pk, np.asarray(w1, np.int64).T[:4])
    dd = data_ct.data
    wstack = jnp.stack([w.data for w in w1_cts], axis=1)
    a = bfv.Ciphertext(dd[:, :, None])
    b = bfv.Ciphertext(wstack[:, None])
    prod = bfv_eval.relinearize(ctx, bfv_eval.multiply(ctx, a, b), stack.rk)
    print(f"after fc1 mult+relin:    {budget(bfv.Ciphertext(prod.data[:, 0, 0]))} bits", flush=True)
    sums = helin.encrypted_vec_sum_log(ctx, prod, stack.gks)
    print(f"after vec_sum_log:       {budget(bfv.Ciphertext(sums.data[:, 0, 0]))} bits", flush=True)
    sq = bfv_eval.relinearize(ctx, bfv_eval.square(ctx, sums), stack.rk)
    print(f"after square+relin:      {budget(bfv.Ciphertext(sq.data[:, 0, 0]))} bits", flush=True)

    logits_ct = hi.csp_eval_2fc(stack, data_ct, w1_cts, np.asarray(w2, np.int64)[:4], row_chunk=32)
    # NOTE: truncated probe — only the first 4 of the 100 fc1 rows are
    # encrypted, so the fc2 small-norm accumulation here sums 4 terms, not
    # the full 100-row sum; the real pipeline's final budget is a few bits
    # lower than this line (log2(100/4) ~ 4.6 bits of extra norm).
    print(
        f"after 2fc TRUNCATED to 4/100 fc1 rows (full-row sum burns ~5 more "
        f"bits): {budget(bfv.Ciphertext(logits_ct.data[:, 0, 0]))} bits",
        flush=True,
    )


if __name__ == "__main__":
    main()
