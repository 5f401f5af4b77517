"""galois_mxu: MXU one-hot-matmul Galois permutations are bit-exact vs
jnp.take of ntt_galois_src (the lowering they replace on the hot path)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hhe_tpu.ops import bfv, bfv_eval, galois_mxu


@pytest.fixture(scope="module")
def ctx():
    return bfv.Context(bfv.BFVParams(n=16384, data_limbs=2, seed=3))


def _elts(ctx):
    # babystep (-1, -5), giantstep (-32), rotate_columns, +step — the hot set
    return [
        ctx.galois_elt_from_step(-1),
        ctx.galois_elt_from_step(-5),
        ctx.galois_elt_from_step(-32),
        ctx.galois_elt_from_step(0),
        ctx.galois_elt_from_step(7),
    ]


def test_affine_factorization(ctx):
    """Every Galois source map factors as row-separable [P,S] tiles."""
    for g in _elts(ctx):
        src = np.asarray(bfv_eval.ntt_galois_src(ctx, g))
        a1, gmap = galois_mxu._factor_src(src)
        rebuilt = (a1[:, None] * 128 + gmap).ravel()
        assert np.array_equal(rebuilt, src)


def test_broadcast_matches_take(ctx):
    elts = _elts(ctx)
    ps = galois_mxu.build_perms(ctx, elts)
    rng = np.random.default_rng(0)
    x = jnp.asarray(
        rng.integers(0, 1 << 32, (3, 2, ctx.n), dtype=np.uint64).astype(np.uint32)
    )
    got = np.asarray(galois_mxu.apply_broadcast(x, ps))
    for j, g in enumerate(elts):
        src = jnp.asarray(bfv_eval.ntt_galois_src(ctx, g))
        want = np.asarray(jnp.take(x, src, axis=-1))
        assert np.array_equal(got[j], want), f"elt {g}"


def test_bsgs_matmul_mxu_bitexact(ctx):
    """The wired hot path: Transcipher._matmul_bsgs with the MXU permutation
    lowering forced ON is bit-identical to the jnp.take lowering."""
    from hhe_tpu.ops import pasta, transcipher

    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    n1, n2 = 8, 16  # small babystep set keeps the CPU graph cheap
    rk = ctx.keygen_relin(sk)
    gks = ctx.keygen_galois(sk, transcipher.galois_elts(ctx, True, n1, n2))
    tc_take = transcipher.Transcipher(
        ctx, rk, gks, n1=n1, n2=n2, use_mxu_galois=False
    )
    tc_mxu = transcipher.Transcipher(
        ctx, rk, gks, n1=n1, n2=n2, use_mxu_galois=True
    )
    assert tc_mxu.use_mxu_galois and tc_mxu.baby_ps is not None
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc_take.encrypt_key(pk, key)
    mats, _rcs = tc_take.block_plaintexts(pasta.NONCE, 0)
    st = bfv.Ciphertext(enc_key.data)
    out_take = tc_take._matmul(st, tc_take.round_mats(mats, 0), tc_take._keys())
    out_mxu = tc_mxu._matmul(st, tc_mxu.round_mats(mats, 0), tc_mxu._keys())
    assert np.array_equal(np.asarray(out_take.data), np.asarray(out_mxu.data))


def test_aligned_matches_take(ctx):
    elts = _elts(ctx)
    ps = galois_mxu.build_perms(ctx, elts)
    rng = np.random.default_rng(1)
    x = jnp.asarray(
        rng.integers(0, 1 << 32, (len(elts), 2, ctx.n), dtype=np.uint64).astype(
            np.uint32
        )
    )
    got = np.asarray(galois_mxu.apply_aligned(x, ps))
    for j, g in enumerate(elts):
        src = jnp.asarray(bfv_eval.ntt_galois_src(ctx, g))
        want = np.asarray(jnp.take(x[j], src, axis=-1))
        assert np.array_equal(got[j], want), f"elt {g}"
