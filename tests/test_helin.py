"""HE linear-algebra helper tests (sealhelper equivalents)."""

import numpy as np
import pytest

from hhe_tpu.ops import bfv, bfv_eval, helin


@pytest.fixture(scope="module")
def stack():
    ctx = bfv.Context(bfv.BFVParams(n=2048, data_limbs=4, seed=21))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    return ctx, sk, pk


def test_weight_roundtrip(stack):
    """Reference Analyst NNModelEncryption decrypt check (Analyst.cpp:433-440)."""
    ctx, sk, pk = stack
    rng = np.random.default_rng(1)
    w = rng.integers(-127, 129, (3, 300), dtype=np.int64)
    cts = helin.encrypt_weight(ctx, pk, w)
    got = helin.decrypt_weight(ctx, sk, cts, 300)
    assert np.array_equal(got, w)


def test_mask_and_flatten(stack):
    """Mask the tail block then flatten 3 blocks of 128 into one ciphertext
    (reference CSP::decompose postprocess, CSP.cpp:235-283) for len 300."""
    ctx, sk, pk = stack
    rng = np.random.default_rng(2)
    data = rng.integers(0, ctx.t, 300, dtype=np.int64)
    blocks = []
    for b in range(3):
        chunk = data[b * 128 : min((b + 1) * 128, 300)]
        vec = np.zeros(128, np.int64)
        vec[: len(chunk)] = chunk
        if b == 2:  # tail block carries garbage beyond 300%128=44
            vec[44:] = rng.integers(0, ctx.t, 128 - 44)
        blocks.append(ctx.encrypt(pk, ctx.encode(vec)))
    elts = helin.flatten_galois_elts(ctx, 3) + [ctx.galois_elt_from_step(-1)]
    gks = ctx.keygen_galois(sk, elts)
    blocks[2] = helin.mask(ctx, blocks[2], helin.make_mask(ctx, 44))
    out = helin.flatten(ctx, blocks, gks)
    got = ctx.decode(ctx.decrypt(sk, out))
    assert np.array_equal(got[:300], data.astype(np.uint64))
    assert not got[300 : ctx.n // 2].any()


def test_vec_sums(stack):
    ctx, sk, pk = stack
    rng = np.random.default_rng(3)
    L = 37
    v = np.zeros(ctx.n // 2, np.int64)
    v[:L] = rng.integers(0, 100, L)
    ct = ctx.encrypt(pk, ctx.encode(v))
    total = int(v.sum()) % ctx.t

    elts = [ctx.galois_elt_from_step(-1)] + helin.vec_sum_galois_elts(ctx)
    gks = ctx.keygen_galois(sk, elts)

    naive = helin.encrypted_vec_sum(ctx, ct, gks, L)
    got = ctx.decode(ctx.decrypt(sk, naive))
    assert int(got[L - 1]) == total

    logd = helin.encrypted_vec_sum_log(ctx, ct, gks)
    got2 = ctx.decode(ctx.decrypt(sk, logd))
    assert int(got2[L - 1]) == total
    assert int(got2[0]) == total  # every slot holds the row total


def test_encrypt_decrypt_bias(stack):
    """Reference sealhelper::encrypt_bias/decrypt_bias (sealhelper.cpp:209-247)."""
    ctx, sk, pk = stack
    bias = np.array([5, -7, 0, 123])
    cts = helin.encrypt_bias(ctx, pk, bias)
    assert len(cts) == 4
    got = helin.decrypt_bias(ctx, sk, cts)
    assert got.tolist() == bias.tolist()
