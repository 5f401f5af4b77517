"""Modular arithmetic + NTT correctness vs exact host golden models."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from hhe_tpu.ops import modular, ntt, primes


def rand_u32(rng, shape, q):
    return rng.integers(0, q, size=shape, dtype=np.uint64).astype(np.uint32)


@pytest.mark.parametrize("q", [65537, (1 << 30) - 2 ** 14 + 1, 2147352577])
def test_mont_mul_matches_host(q):
    if not primes.is_prime(q):
        pytest.skip("not prime")
    rng = np.random.default_rng(0)
    a = rand_u32(rng, (1000,), q)
    b = rand_u32(rng, (1000,), q)
    qinv_neg, r1, r2 = modular.mont_constants(q)
    b_mont = modular.to_mont_host(b, q)
    got = modular.mont_mul(jnp.asarray(a), jnp.asarray(b_mont), np.uint32(q), qinv_neg)
    want = modular.host.mul_mod(a, b, q)
    np.testing.assert_array_equal(np.asarray(got, np.uint64), want)


def test_mont_roundtrip():
    q = 2147352577  # < 2^31, prime, q = 2^31 - 2^19 + 1? validated in host
    assert primes.is_prime(q)
    rng = np.random.default_rng(1)
    a = rand_u32(rng, (512,), q)
    qinv_neg, r1, r2 = modular.mont_constants(q)
    am = modular.to_mont(jnp.asarray(a), r2, np.uint32(q), qinv_neg)
    back = modular.from_mont(am, np.uint32(q), qinv_neg)
    np.testing.assert_array_equal(np.asarray(back), a)


def test_add_sub_neg():
    q = 65537
    rng = np.random.default_rng(2)
    a = rand_u32(rng, (257,), q)
    b = rand_u32(rng, (257,), q)
    np.testing.assert_array_equal(
        np.asarray(modular.add_mod(jnp.asarray(a), jnp.asarray(b), np.uint32(q)), np.uint64),
        modular.host.add_mod(a, b, q),
    )
    np.testing.assert_array_equal(
        np.asarray(modular.sub_mod(jnp.asarray(a), jnp.asarray(b), np.uint32(q)), np.uint64),
        modular.host.sub_mod(a, b, q),
    )
    np.testing.assert_array_equal(
        np.asarray(modular.neg_mod(jnp.asarray(a), np.uint32(q)), np.uint64),
        (np.uint64(q) - a.astype(np.uint64)) % np.uint64(q),
    )


def test_ntt_primes_generation():
    qs = primes.ntt_primes(16384, 30, 14)
    assert len(qs) == len(set(qs)) == 14
    for q in qs:
        assert q % 32768 == 1 and q < (1 << 30) and primes.is_prime(q)


@pytest.mark.parametrize("n", [16, 256])
def test_ntt_inverse_roundtrip(n):
    qs = primes.ntt_primes(n, 30, 3)
    tb = ntt.build_tables(qs, n)
    rng = np.random.default_rng(3)
    x = np.stack([rand_u32(rng, (n,), q) for q in qs])
    back = ntt.ntt_inv(ntt.ntt_fwd(jnp.asarray(x), tb), tb)
    np.testing.assert_array_equal(np.asarray(back), x)


def test_ntt_fwd_is_psi_evaluation():
    """Forward NTT output i = p(psi^(2*bitrev(i)+1)) — pin down ordering."""
    n = 16
    q = primes.ntt_primes(n, 29, 1)[0]
    tb = ntt.build_tables((q,), n)
    rng = np.random.default_rng(4)
    x = rand_u32(rng, (1, n), q)
    out = np.asarray(ntt.ntt_fwd(jnp.asarray(x), tb))[0].astype(np.uint64)
    psi = primes.root_of_unity(2 * n, q)
    rev = ntt.bit_reverse_indices(n)
    coeffs = [int(c) for c in x[0]]
    for i in range(n):
        e = pow(psi, 2 * int(rev[i]) + 1, q)
        want = sum(c * pow(e, j, q) for j, c in enumerate(coeffs)) % q
        assert int(out[i]) == want, i


@pytest.mark.parametrize("n", [16, 128])
def test_negacyclic_mul(n):
    qs = primes.ntt_primes(n, 30, 2)
    tb = ntt.build_tables(qs, n)
    rng = np.random.default_rng(5)
    a = np.stack([rand_u32(rng, (n,), q) for q in qs])
    b = np.stack([rand_u32(rng, (n,), q) for q in qs])
    got = np.asarray(ntt.negacyclic_mul(jnp.asarray(a), jnp.asarray(b), tb))
    for i, q in enumerate(qs):
        want = ntt.negacyclic_mul_host(a[i], b[i], q)
        np.testing.assert_array_equal(got[i].astype(np.uint64), want)


def test_ntt_batch_dims():
    n = 64
    qs = primes.ntt_primes(n, 30, 2)
    tb = ntt.build_tables(qs, n)
    rng = np.random.default_rng(6)
    x = np.stack(
        [np.stack([rand_u32(rng, (n,), q) for q in qs]) for _ in range(5)]
    )  # [5, k, n]
    one = ntt.ntt_fwd(jnp.asarray(x[0]), tb)
    batch = ntt.ntt_fwd(jnp.asarray(x), tb)
    np.testing.assert_array_equal(np.asarray(batch[0]), np.asarray(one))


def test_mxu_ntt_matches_butterfly():
    """Four-step MXU NTT (int8 digit matmuls) is exactly interchangeable with
    the butterfly NTT, forward and inverse."""
    import jax.numpy as jnp

    from hhe_tpu.ops import ntt_mxu

    n = 2048
    mods = primes.ntt_primes(n, 30, 3)
    tb = ntt.build_tables(mods, n)
    tbm = ntt_mxu.build_tables(mods, n)
    rng = np.random.default_rng(7)
    x = jnp.asarray(np.stack([rng.integers(0, m, n) for m in mods]).astype(np.uint32))
    f_bf = np.asarray(ntt.ntt_fwd(x, tb))
    f_mx = np.asarray(ntt_mxu.ntt_fwd(x, tbm))
    assert np.array_equal(f_bf, f_mx)
    assert np.array_equal(
        np.asarray(ntt_mxu.ntt_inv(jnp.asarray(f_mx), tbm)), np.asarray(x)
    )


def test_pallas_ntt_matches_butterfly():
    """Fused Pallas NTT (interpret mode on CPU) is bit-identical to the
    butterfly NTT, forward and inverse, incl. batched leading dims."""
    import jax.numpy as jnp

    from hhe_tpu.ops import ntt_pallas

    # 30-bit moduli exercise the Harvey lazy-reduction kernels; adding a
    # 31-bit modulus forces the eager kernels (lazy requires 4q < 2^32)
    for n, bits in ((256, 30), (2048, 30), (2048, 31)):
        mods = primes.ntt_primes(n, bits, 2)
        tb = ntt.build_tables(mods, n)
        from hhe_tpu.ops import ntt_pallas as _np_mod

        assert _np_mod._build(mods, n, False).lazy == (bits == 30)
        rng = np.random.default_rng(8)
        x = jnp.asarray(
            np.stack(
                [
                    np.stack([rng.integers(0, m, n) for m in mods])
                    for _ in range(3)
                ]
            ).astype(np.uint32)
        )  # [3, k, n]
        f_bf = np.asarray(ntt._ntt_fwd_xla(x, tb))
        f_pl = np.asarray(ntt_pallas.ntt_fwd(x, tb, interpret=True))
        assert np.array_equal(f_bf, f_pl)
        i_bf = np.asarray(ntt._ntt_inv_xla(jnp.asarray(f_bf), tb))
        i_pl = np.asarray(ntt_pallas.ntt_inv(jnp.asarray(f_bf), tb, interpret=True))
        assert np.array_equal(i_bf, i_pl)
        assert np.array_equal(i_pl, np.asarray(x))
