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
