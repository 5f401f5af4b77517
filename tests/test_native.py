"""Native C++ library parity tests (Keccak/SHAKE128 from spec, PASTA expansion)."""

import hashlib

import numpy as np
import pytest

from hhe_tpu import native
from hhe_tpu.ops import pasta

pytestmark = pytest.mark.skipif(not native.available(), reason="no native toolchain")


def test_shake128_vs_hashlib():
    for seed in (b"", b"abc", bytes(range(16)), b"x" * 100):
        assert native.shake128(seed, 500) == hashlib.shake_128(seed).digest(500)


def test_block_randomness_matches_python():
    m1, m2, r1, r2 = native.pasta_block_randomness(65537, 424242, 3)
    stream = pasta.ShakeStream(pasta._shake_seed(424242, 3))
    for r in range(4):
        pm1 = pasta._expand_matrix(pasta._sample_exact(stream, 128, 65537, False), 65537)
        pm2 = pasta._expand_matrix(pasta._sample_exact(stream, 128, 65537, False), 65537)
        pr1 = pasta._sample_exact(stream, 128, 65537, True)
        pr2 = pasta._sample_exact(stream, 128, 65537, True)
        assert np.array_equal(m1[r], pm1)
        assert np.array_equal(m2[r], pm2)
        assert np.array_equal(r1[r], pr1)
        assert np.array_equal(r2[r], pr2)


def test_keystreams_match_golden():
    key = pasta.get_fixed_symmetric_key()
    ks = native.pasta_keystreams(65537, pasta.NONCE, 0, key[None, :])
    # golden vectors were generated from the reference binary
    import pathlib

    gold = np.load(pathlib.Path(__file__).parent / "data" / "pasta_golden.npz")
    if "keystream_b0" in gold:
        assert np.array_equal(ks[0], gold["keystream_b0"])
    cipher = pasta.Pasta(key, 65537)
    x = np.arange(128, dtype=np.uint64)
    assert np.array_equal((x + ks[0]) % np.uint64(65537), cipher.encrypt(x))


def test_keystreams_31bit_modulus():
    """PASTA works for any NTT-friendly prime (31-bit t for the 2FC path)."""
    p = 2147352577
    key = pasta.get_fixed_symmetric_key()
    ks = native.pasta_keystreams(p, pasta.NONCE, 0, key[None, :])
    assert np.array_equal(ks[0], pasta.keystream(key, p, pasta.NONCE, 0))
