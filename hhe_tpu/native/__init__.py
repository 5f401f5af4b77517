"""ctypes bindings for the native host-side library (lazy-built with g++).

Provides SHAKE128, PASTA block-randomness expansion, and batched PASTA
keystreams as a C++ shared library; ``available()`` gates callers so pure-
Python fallbacks keep working when no toolchain is present.
"""

from __future__ import annotations

import ctypes
import os
import pathlib
import subprocess
import threading
from typing import Optional, Tuple

import numpy as np

_HERE = pathlib.Path(__file__).resolve().parent
_SRC = _HERE / "hhe_native.cpp"
_SO = _HERE / "libhhe_native.so"
_lock = threading.Lock()
_lib: Optional[ctypes.CDLL] = None
_tried = False


def _build() -> bool:
    try:
        subprocess.run(
            ["g++", "-O3", "-march=native", "-shared", "-fPIC",
             "-o", str(_SO), str(_SRC)],
            check=True, capture_output=True, timeout=120,
        )
        return True
    except Exception:
        return False


def _load() -> Optional[ctypes.CDLL]:
    global _lib, _tried
    with _lock:
        if _lib is not None or _tried:
            return _lib
        _tried = True
        if not _SO.exists() or _SO.stat().st_mtime < _SRC.stat().st_mtime:
            if not _build():
                return None
        try:
            lib = ctypes.CDLL(str(_SO))
        except OSError:
            return None
        u64 = ctypes.c_uint64
        p8 = ctypes.POINTER(ctypes.c_uint8)
        p64 = ctypes.POINTER(ctypes.c_uint64)
        lib.hhe_shake128.argtypes = [p8, u64, p8, u64]
        lib.hhe_pasta_block_randomness.argtypes = [u64, u64, u64, p64, p64, p64, p64]
        lib.hhe_pasta_keystreams.argtypes = [u64, u64, u64, p64, u64, p64]
        _lib = lib
        return _lib


def available() -> bool:
    return _load() is not None


def _p64(a: np.ndarray):
    return a.ctypes.data_as(ctypes.POINTER(ctypes.c_uint64))


def shake128(seed: bytes, outlen: int) -> bytes:
    lib = _load()
    assert lib is not None
    out = np.zeros(outlen, np.uint8)
    seed_arr = np.frombuffer(seed, np.uint8).copy()
    lib.hhe_shake128(
        seed_arr.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        len(seed),
        out.ctypes.data_as(ctypes.POINTER(ctypes.c_uint8)),
        outlen,
    )
    return out.tobytes()


def pasta_block_randomness(
    p: int, nonce: int, counter: int
) -> Tuple[np.ndarray, np.ndarray, np.ndarray, np.ndarray]:
    """(mats1 [4,128,128], mats2, rcs1 [4,128], rcs2) u64."""
    lib = _load()
    assert lib is not None
    m1 = np.zeros((4, 128, 128), np.uint64)
    m2 = np.zeros((4, 128, 128), np.uint64)
    r1 = np.zeros((4, 128), np.uint64)
    r2 = np.zeros((4, 128), np.uint64)
    lib.hhe_pasta_block_randomness(
        p, nonce, counter, _p64(m1), _p64(m2), _p64(r1), _p64(r2)
    )
    return m1, m2, r1, r2


def pasta_keystreams(
    p: int, nonce: int, counter: int, keys: np.ndarray
) -> np.ndarray:
    """Batched keystream blocks: keys [nkeys, 256] -> [nkeys, 128]."""
    lib = _load()
    assert lib is not None
    keys = np.ascontiguousarray(keys, np.uint64)
    nkeys = keys.shape[0]
    out = np.zeros((nkeys, 128), np.uint64)
    lib.hhe_pasta_keystreams(p, nonce, counter, _p64(keys), nkeys, _p64(out))
    return out
