"""Transcipher tests.

1. Structural parity of the homomorphic linear layer (matmul+rc+mix) against
   the plain PASTA round on a small context (fast).
2. Full 3-round decomposition parity: decompose(PASTA_encrypt(x)) must
   BFV-decrypt back to x — the reference's hard-failure check
   (``hhe_pktnn_examples.cpp:638-648``) — on the production context (slow).
"""

import numpy as np
import pytest

from hhe_tpu.ops import bfv, bfv_eval, pasta, transcipher


def make_stack(n, limbs, seed=11, use_bsgs=True, device_keygen=False):
    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=limbs, seed=seed))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    if device_keygen:
        rk, gks = ctx.keygen_eval_keys_device(
            sk, transcipher.galois_elts(ctx, use_bsgs), include_relin=True, seed=seed
        )
    else:
        rk = ctx.keygen_relin(sk)
        gks = ctx.keygen_galois(sk, transcipher.galois_elts(ctx, use_bsgs))
    tc = transcipher.Transcipher(ctx, rk, gks, use_bsgs=use_bsgs)
    return ctx, sk, pk, tc


@pytest.fixture(scope="module")
def small_stack():
    return make_stack(2048, 4)


@pytest.mark.parametrize("use_bsgs", [False, True], ids=["diagonal", "bsgs"])
def test_linear_layer_parity(small_stack, use_bsgs):
    """matmul + add_rc + mix on the encrypted key == plain PASTA linear layer,
    in both the reference-exact diagonal mode and the hoisted BSGS mode."""
    ctx, sk, pk, tc_b = small_stack
    tc = tc_b if use_bsgs else transcipher.Transcipher(
        ctx, tc_b.rk, {g: tc_b.gks_all[g] for g in tc_b.gks_all}, use_bsgs=False
    )
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    mats_pt, rcs_pt = tc.block_plaintexts(pasta.NONCE, 0)

    st = tc._matmul(bfv.Ciphertext(enc_key.data), tc.round_mats(mats_pt, 0), tc._keys())
    st = bfv_eval.add_plain(ctx, st, rcs_pt[0])
    st = tc._mix(st, tc._keys())

    p = np.uint64(ctx.t)
    mats1, mats2, rcs1, rcs2 = pasta.block_randomness(ctx.t, pasta.NONCE, 0)
    s1 = (mats1[0] @ key[: transcipher.T] + rcs1[0]) % p
    s2 = (mats2[0] @ key[transcipher.T :] + rcs2[0]) % p
    tot = (s1 + s2) % p
    s1, s2 = (s1 + tot) % p, (s2 + tot) % p

    got = ctx.decode(ctx.decrypt(sk, st))
    half = ctx.n // 2
    assert np.array_equal(got[: transcipher.T], s1)
    assert np.array_equal(got[half : half + transcipher.T], s2)
    assert not got[transcipher.T : half].any(), "slots outside window must stay 0"


def test_feistel_sbox_parity(small_stack):
    """Homomorphic feistel sbox on a fresh encryption of a state vector."""
    ctx, sk, pk, tc = small_stack
    rng = np.random.default_rng(3)
    half = ctx.n // 2
    v1 = rng.integers(0, ctx.t, transcipher.T, dtype=np.int64)
    v2 = rng.integers(0, ctx.t, transcipher.T, dtype=np.int64)
    vec = np.zeros(half + transcipher.T, np.int64)
    vec[: transcipher.T] = v1
    vec[half :] = v2
    ct = ctx.encrypt(pk, ctx.encode(vec))
    out = tc._sbox_feistel(ct, tc._keys())
    got = ctx.decode(ctx.decrypt(sk, out))
    exp1 = pasta._sbox_feistel(v1.astype(np.uint64), ctx.t)
    exp2 = pasta._sbox_feistel(v2.astype(np.uint64), ctx.t)
    assert np.array_equal(got[: transcipher.T], exp1)
    assert np.array_equal(got[half : half + transcipher.T], exp2)


@pytest.mark.slow
def test_full_decomposition_parity():
    """decompose(PASTA_encrypt(x)) decrypts to x on the production context
    (N=16384, t=65537 — reference config.cpp:15-21), with a HEALTHY noise
    margin (>=40 bits) and per-round budget telemetry (reference debug path
    pasta_3_seal.cpp:73).

    Eval keys are generated on device (batched JAX keygen) — host keygen of
    ~40 N=16384 galois keys took tens of minutes in numpy. Expected runtime:
    a few minutes warm (persistent compile cache), ~10 min cold."""
    ctx, sk, pk, tc = make_stack(16384, 13, seed=1, device_keygen=True)
    key = pasta.get_fixed_symmetric_key()
    cipher = pasta.Pasta(key, ctx.t)
    rng = np.random.default_rng(5)
    x = rng.integers(0, 256, (2, transcipher.T), dtype=np.uint64)  # 2 ECG-ish samples
    c = cipher.encrypt(x)
    enc_key = tc.encrypt_key(pk, key)
    res = tc.decompose(enc_key, c)
    assert len(res) == 1
    data = np.asarray(res[0].data)  # [2, B, k, N]
    for i in range(2):
        ct_i = bfv.Ciphertext(data[:, i])
        assert ctx.noise_budget(sk, ct_i) >= 40, "noise margin unhealthy"
        got = ctx.decode(ctx.decrypt(sk, ct_i))[: transcipher.T]
        assert np.array_equal(got, x[i]), f"sample {i} mismatch"
    # per-round telemetry: budgets monotonically decrease, end healthy
    budgets = tc.keystream_round_budgets(enc_key, sk)
    assert all(b1 >= b2 for b1, b2 in zip(budgets, budgets[1:])), budgets
    assert budgets[-1] >= 40, budgets
