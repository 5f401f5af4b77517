"""PASTA-3 bit-exactness against golden vectors generated from the reference
implementation (reference src/pasta/pasta_3_plain.cpp compiled with the
vendored Keccak, fixed key from src/util/pastahelper.cpp:37-297)."""

import pathlib

import numpy as np
import pytest

from hhe_tpu.ops import pasta

DATA = pathlib.Path(__file__).parent / "data" / "pasta_golden.npz"


@pytest.fixture(scope="module")
def golden():
    return np.load(DATA)


def test_fixed_key_shape(golden):
    key = golden["key"]
    assert key.shape == (256,)
    assert key[0] == 0x07A30 and key[1] == 0x0CFE2


def test_keystream_bit_exact(golden):
    """Keystream of blocks 0..3 == reference encrypt(zeros)."""
    key = golden["key"]
    ks = pasta.keystream_for_length(key, 65537, 512)
    np.testing.assert_array_equal(ks, golden["ks"])


def test_encrypt_bit_exact(golden):
    key = golden["key"]
    cipher = pasta.Pasta(key, 65537)
    pt = (np.arange(300, dtype=np.uint64) * 7919 + 13) % 65537
    ct = cipher.encrypt(pt)
    np.testing.assert_array_equal(ct, golden["ct300"])


def test_roundtrip(golden):
    key = golden["key"]
    cipher = pasta.Pasta(key, 65537)
    rng = np.random.default_rng(0)
    pt = rng.integers(0, 65537, size=300, dtype=np.uint64)
    np.testing.assert_array_equal(cipher.decrypt(cipher.encrypt(pt)), pt)


def test_batched_encrypt(golden):
    """Keystream broadcasts across a sample batch (TPU data-parallel path)."""
    key = golden["key"]
    cipher = pasta.Pasta(key, 65537)
    rng = np.random.default_rng(1)
    batch = rng.integers(0, 65537, size=(8, 300), dtype=np.uint64)
    ct = cipher.encrypt(batch)
    for i in range(8):
        np.testing.assert_array_equal(ct[i], cipher.encrypt(batch[i]))
    np.testing.assert_array_equal(cipher.decrypt(ct), batch)


def test_randomness_cached(golden):
    r1 = pasta.block_randomness(65537, pasta.NONCE, 0)
    r2 = pasta.block_randomness(65537, pasta.NONCE, 0)
    assert r1[0][0] is r2[0][0]  # lru_cache hit


def test_matrix_structure(golden):
    """Round matrices follow the sequential-row recurrence of the reference."""
    mats1, _, _, _ = pasta.block_randomness(65537, pasta.NONCE, 0)
    m = mats1[0]
    p = 65537
    for i in range(1, 5):
        row = (m[0] * int(m[i - 1][127]) + np.concatenate([[0], m[i - 1][:-1]])) % p
        np.testing.assert_array_equal(m[i], row)
