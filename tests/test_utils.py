"""checks / metrics / serialization utility tests."""

import numpy as np
import pytest

from hhe_tpu.ops import bfv
from hhe_tpu.utils import checks, metrics, serial


@pytest.fixture(scope="module")
def ctx():
    return bfv.Context(bfv.BFVParams(n=1024, data_limbs=3, seed=5))


def test_checks(ctx):
    checks.are_same_vectors([1, 2], [1, 2])
    with pytest.raises(checks.CheckFailed):
        checks.are_same_vectors([1, 2], [2, 1])
    sk1 = ctx.keygen_secret()
    sk2 = ctx.keygen_secret()
    checks.are_same_he_sk(sk1, sk2)  # distinct keys pass
    with pytest.raises(checks.CheckFailed):
        checks.are_same_he_sk(sk1, sk1)


def test_serialization_roundtrips(ctx):
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    ct = ctx.encrypt(pk, ctx.encode(np.arange(50)))
    ct2 = serial.load_ciphertext(serial.dump_ciphertext(ct))
    assert np.array_equal(np.asarray(ct.data), np.asarray(ct2.data))
    rk = ctx.keygen_relin(sk)
    rk2 = serial.load_kswitch(serial.dump_kswitch(rk))
    assert np.array_equal(np.asarray(rk.k0), np.asarray(rk2.k0))
    g = ctx.galois_elt_from_step(1)
    gks = ctx.keygen_galois(sk, [g])
    gks2 = serial.load_galois_keys(serial.dump_galois_keys(gks))
    assert np.array_equal(np.asarray(gks[g].k1), np.asarray(gks2[g].k1))
    vec = serial.load_ciphertext_vec(serial.dump_ciphertext_vec([ct, ct]))
    assert len(vec) == 2


def test_metrics(ctx):
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    ct = ctx.encrypt(pk, ctx.encode([1]))
    assert metrics.he_pk_size(pk) > 0
    assert metrics.he_vec_size([ct]) > 0
    ledger = metrics.CommLedger()
    ledger.add("analyst-csp", 1.5)
    ledger.add("analyst-csp", 0.5)
    assert ledger.report() == {"analyst-csp": 2.0}
    t = metrics.Timer()
    with t.phase("x"):
        pass
    assert "x" in t.report_ms()


def test_serial_zlib_container():
    """Compressed save/load (SEAL's optional zlib compr_mode,
    seal/serialization.h + seal/util/ztools.h): every load_* transparently
    accepts both raw and compressed payloads."""
    import numpy as np
    import jax.numpy as jnp

    from hhe_tpu.ops import bfv
    from hhe_tpu.utils import serial

    ct = bfv.Ciphertext(jnp.asarray(np.zeros((2, 3, 64), np.uint32)))
    raw = serial.dump_ciphertext(ct)
    z = serial.compress(raw)
    assert len(z) < len(raw)  # zeros compress well
    got = serial.load_ciphertext(z)
    assert np.array_equal(np.asarray(got.data), np.asarray(ct.data))
    got2 = serial.load_ciphertext(raw)
    assert np.array_equal(np.asarray(got2.data), np.asarray(ct.data))
    vec = serial.dump_ciphertext_vec([ct, ct])
    back = serial.load_ciphertext_vec(serial.compress(vec))
    assert len(back) == 2


def test_compile_cache_force_attrs_exist():
    """The axon compile-cache force-enable patches jax private internals
    (jax._src.compilation_cache._cache_checked/_cache_used under the init
    mutex); a jax upgrade renaming them would silently reintroduce ~400 s
    of remote compile per process (advisor round-4 finding).  Pin the
    contract here so a jax bump fails loudly instead."""
    from jax._src import compilation_cache as cc

    assert hasattr(cc, "_cache_initialized_mutex")
    assert hasattr(cc, "_cache_checked")
    assert hasattr(cc, "_cache_used")
    assert callable(cc._is_cache_enabled)


def test_he_vec_size_analytic_matches_serialized():
    """he_vec_size_analytic (shape-only meter, no device->host transfer)
    must be byte-equal to serializing each sample frame of a batched ct."""
    import jax.numpy as jnp

    from hhe_tpu.ops import bfv
    from hhe_tpu.utils import metrics
    from hhe_tpu.workloads.hhe_inference import _split_batch

    for shape in ((2, 3, 64), (2, 5, 3, 64), (3, 2, 4, 32)):
        ct = bfv.Ciphertext(jnp.asarray(np.zeros(shape, np.uint32)))
        assert metrics.he_vec_size_analytic(ct) == metrics.he_vec_size(
            _split_batch(ct)
        ), shape
