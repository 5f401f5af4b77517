"""BFV core tests: encode/encrypt/decrypt roundtrips, evaluator parity.

Mirrors the reference's inline decrypt-and-compare checks
(``tests/he_test.cpp``, ``src/examples/hhe_pktnn_examples.cpp`` self-checks)
as real unit tests, on a small-but-real parameter set (N=2048).
"""

import numpy as np
import pytest

from hhe_tpu.ops import bfv, bfv_eval


@pytest.fixture(scope="module")
def ctx():
    return bfv.Context(bfv.BFVParams(n=2048, data_limbs=4, seed=7))


@pytest.fixture(scope="module")
def keys(ctx):
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    return sk, pk


def rand_slots(ctx, seed, lo=0, hi=None):
    rng = np.random.default_rng(seed)
    return rng.integers(lo, hi if hi is not None else ctx.t, ctx.n, dtype=np.int64)


def test_encode_decode_roundtrip(ctx):
    v = rand_slots(ctx, 1)
    assert np.array_equal(ctx.decode(ctx.encode(v)), v.astype(np.uint64))


def test_encrypt_decrypt(ctx, keys):
    sk, pk = keys
    v = rand_slots(ctx, 2)
    ct = ctx.encrypt(pk, ctx.encode(v))
    assert ctx.noise_budget(sk, ct) > 40
    out = ctx.decode(ctx.decrypt(sk, ct))
    assert np.array_equal(out, v.astype(np.uint64))


def test_add_sub_negate(ctx, keys):
    sk, pk = keys
    a = rand_slots(ctx, 3)
    b = rand_slots(ctx, 4)
    ca = ctx.encrypt(pk, ctx.encode(a))
    cb = ctx.encrypt(pk, ctx.encode(b))
    assert np.array_equal(
        ctx.decode(ctx.decrypt(sk, bfv_eval.add(ctx, ca, cb))), (a + b) % ctx.t
    )
    assert np.array_equal(
        ctx.decode(ctx.decrypt(sk, bfv_eval.sub(ctx, ca, cb))), (a - b) % ctx.t
    )
    assert np.array_equal(
        ctx.decode(ctx.decrypt(sk, bfv_eval.negate(ctx, ca))), (-a) % ctx.t
    )


def test_plain_ops(ctx, keys):
    sk, pk = keys
    a = rand_slots(ctx, 5)
    b = rand_slots(ctx, 6)
    ca = ctx.encrypt(pk, ctx.encode(a))
    pb = ctx.encode(b)
    assert np.array_equal(
        ctx.decode(ctx.decrypt(sk, bfv_eval.add_plain(ctx, ca, ctx.plain_for_add(pb)))),
        (a + b) % ctx.t,
    )
    prod = bfv_eval.multiply_plain(ctx, ca, ctx.plain_for_mul(pb))
    assert np.array_equal(
        ctx.decode(ctx.decrypt(sk, prod)), (a * b) % ctx.t
    )


def test_rotations(ctx, keys):
    sk, pk = keys
    elts = [ctx.galois_elt_from_step(s) for s in (1, -1, 5)] + [2 * ctx.n - 1]
    gks = ctx.keygen_galois(sk, elts)
    v = rand_slots(ctx, 7)
    ct = ctx.encrypt(pk, ctx.encode(v))
    half = ctx.n // 2
    rows = v.reshape(2, half)
    for step in (1, -1, 5):
        out = ctx.decode(ctx.decrypt(sk, bfv_eval.rotate_rows(ctx, ct, step, gks)))
        expect = np.roll(rows, -step, axis=1).reshape(-1)
        assert np.array_equal(out, expect % ctx.t), f"step {step}"
    out = ctx.decode(ctx.decrypt(sk, bfv_eval.rotate_columns(ctx, ct, gks)))
    assert np.array_equal(out, rows[::-1].reshape(-1) % ctx.t)


def test_multiply_relinearize_square(ctx, keys):
    sk, pk = keys
    rk = ctx.keygen_relin(sk)
    a = rand_slots(ctx, 8)
    b = rand_slots(ctx, 9)
    ca = ctx.encrypt(pk, ctx.encode(a))
    cb = ctx.encrypt(pk, ctx.encode(b))
    prod = bfv_eval.multiply(ctx, ca, cb)
    assert prod.size == 3
    assert np.array_equal(
        ctx.decode(ctx.decrypt(sk, prod)), (a * b) % ctx.t
    )
    rel = bfv_eval.relinearize(ctx, prod, rk)
    assert rel.size == 2
    assert ctx.noise_budget(sk, rel) > 0
    assert np.array_equal(ctx.decode(ctx.decrypt(sk, rel)), (a * b) % ctx.t)
    sq = bfv_eval.relinearize(ctx, bfv_eval.square(ctx, ca), rk)
    assert np.array_equal(ctx.decode(ctx.decrypt(sk, sq)), (a * a) % ctx.t)


def test_cube(ctx, keys):
    sk, pk = keys
    rk = ctx.keygen_relin(sk)
    a = rand_slots(ctx, 10)
    ca = ctx.encrypt(pk, ctx.encode(a))
    cube = bfv_eval.exponentiate(ctx, ca, 3, rk)
    assert ctx.noise_budget(sk, cube) > 0
    assert np.array_equal(
        ctx.decode(ctx.decrypt(sk, cube)), (a * a % ctx.t) * a % ctx.t
    )


def test_device_keygen_eval_keys(ctx, keys):
    """Relin + galois keys generated entirely on device decrypt-parity with
    host-generated ones (rotation + relinearized square)."""
    sk, pk = keys
    g = ctx.galois_elt_from_step(2)
    rk, gks = ctx.keygen_eval_keys_device(sk, [g], include_relin=True, seed=9)
    v = rand_slots(ctx, 20)
    ct = ctx.encrypt(pk, ctx.encode(v))
    half = ctx.n // 2
    out = ctx.decode(ctx.decrypt(sk, bfv_eval.rotate_rows(ctx, ct, 2, gks)))
    expect = np.roll(v.reshape(2, half), -2, axis=1).reshape(-1) % ctx.t
    assert np.array_equal(out, expect)
    sq = bfv_eval.relinearize(ctx, bfv_eval.square(ctx, ct), rk)
    assert ctx.noise_budget(sk, sq) > 0
    assert np.array_equal(ctx.decode(ctx.decrypt(sk, sq)), (v * v) % ctx.t)


def test_large_degree_preset():
    """The reference's 65536 large preset (SEAL_Cipher.cpp:47-61): the full
    1740-bit-class prime chain exists, and a reduced-limb context at that
    degree encrypts/decrypts AND performs a real rotation (galois key-switch).
    The full 58-limb chain (keygen, rotation, transcipher round, sharded
    NTT keygen backend) is exercised by the slow tests in
    tests/test_large_preset.py."""
    from hhe_tpu.ops import primes

    params_full = bfv.large_params()
    chain = primes.ntt_primes(65536, params_full.data_limb_bits, params_full.data_limbs)
    assert len(set(chain)) == params_full.data_limbs

    ctx = bfv.Context(bfv.large_params(data_limbs=4, seed=3))
    assert ctx.n == 65536 and (ctx.t - 1) % (2 * ctx.n) == 0
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    rng = np.random.default_rng(4)
    v = rng.integers(0, ctx.t, 200, dtype=np.int64)
    ct = ctx.encrypt(pk, ctx.encode(v))
    assert np.array_equal(ctx.decode(ctx.decrypt(sk, ct))[:200], v)
    # a real rotation at this degree: keygen + hybrid key-switch + decrypt
    g = ctx.galois_elt_from_step(3)
    gks = ctx.keygen_galois(sk, [g])
    rot = bfv_eval.rotate_rows(ctx, ct, 3, gks)
    assert ctx.noise_budget(sk, rot) > 0
    got = ctx.decode(ctx.decrypt(sk, rot))
    half = ctx.n // 2
    vv = np.zeros(ctx.n, np.uint64)
    vv[:200] = v
    expect = np.roll(vv.reshape(2, half), -3, axis=1).reshape(-1)
    assert np.array_equal(got, expect)


def test_mod_switch_to_next(ctx, keys):
    """Dropping limbs keeps the plaintext intact and shrinks the wire size
    (reference SEAL Evaluator::mod_switch_to_next; size accounting
    SEAL_Cipher.cpp:363-378)."""
    from hhe_tpu.utils import metrics

    sk, pk = keys
    v = rand_slots(ctx, 11)
    ct = ctx.encrypt(pk, ctx.encode(v))
    full_mb = metrics.cipher_size(ctx, ct)
    budget0 = ctx.noise_budget(sk, ct)
    ct1 = ctx.mod_switch_to_next(ct)
    assert ct1.data.shape[-2] == ct.data.shape[-2] - 1
    assert np.array_equal(ctx.decode(ctx.decrypt(sk, ct1)), v.astype(np.uint64))
    assert ctx.noise_budget(sk, ct1) > 0
    # two levels down still decrypts; size accounting reflects the drop
    ct2 = ctx.mod_switch_to_next(ct1)
    assert np.array_equal(ctx.decode(ctx.decrypt(sk, ct2)), v.astype(np.uint64))
    small_mb = metrics.cipher_size(ctx, ct, mod_switch=True, levels_from_last=1)
    assert small_mb < full_mb / 1.9
    assert budget0 > 0


def test_cipher_size_levels_from_last_semantics(ctx, keys):
    """levels_from_last counts UP from the LAST (1-limb) level, exactly as
    the reference (SEAL_Cipher.cpp:363-378: switch to last_context_data,
    then prev_context_data ×levels_from_last → 1+levels_from_last limbs).
    With 4 limbs this distinguishes the two interpretations: levels_from_last=0
    must land on 1 limb (not 3), =2 on 3 limbs (not 1)."""
    from hhe_tpu.utils import metrics

    sk, pk = keys
    v = rand_slots(ctx, 12)
    ct = ctx.encrypt(pk, ctx.encode(v))
    k = ct.data.shape[-2]
    assert k == 4
    mb1 = metrics.cipher_size(ctx, ct, mod_switch=True, levels_from_last=0)
    mb3 = metrics.cipher_size(ctx, ct, mod_switch=True, levels_from_last=2)
    mb_full = metrics.cipher_size(ctx, ct)
    # sizes scale ~linearly with limb count: 1 vs 3 vs 4 limbs
    assert mb1 < mb_full * 1.5 / 4
    assert mb_full * 2.5 / 4 < mb3 < mb_full * 3.5 / 4
    # clamping: levels_from_last beyond the chain leaves the ct untouched
    assert metrics.cipher_size(ctx, ct, mod_switch=True, levels_from_last=9) == mb_full


def test_decrypt_batch_bit_identical(ctx, keys):
    """Vectorized batched decrypt (device c(s) product + exact u64
    fixed-point scale-and-round) == per-sample decrypt+decode, including a
    size-3 (unrelinearized) ciphertext.  Backs the analyst-side decrypt at
    dataset scale (reference decrypts per sample, Analyst.cpp:352-381)."""
    import jax.numpy as jnp

    sk, pk = keys
    rng = np.random.default_rng(11)
    B = 4
    cts = [
        np.asarray(
            ctx.encrypt(pk, ctx.encode(rng.integers(-200, 200, ctx.n))).data
        )
        for _ in range(B)
    ]
    batch = bfv.Ciphertext(jnp.asarray(np.stack(cts, axis=1)))  # [2, B, k, N]
    slots = ctx.decode_signed_batch(ctx.decrypt_batch(sk, batch))
    for i in range(B):
        ref = ctx.decode_signed(ctx.decrypt(sk, bfv.Ciphertext(jnp.asarray(cts[i]))))
        assert np.array_equal(slots[i], ref)
    # size-3 ct (pre-relinearization product)
    prod = bfv_eval.multiply(
        ctx,
        bfv.Ciphertext(jnp.asarray(cts[0])[:, None]),
        bfv.Ciphertext(jnp.asarray(cts[1])[:, None]),
    )
    got = ctx.decode_signed_batch(ctx.decrypt_batch(sk, prod))[0]
    ref = ctx.decode_signed(
        ctx.decrypt(sk, bfv.Ciphertext(jnp.asarray(np.asarray(prod.data)[:, 0])))
    )
    assert np.array_equal(got, ref)
