"""32-bit-lane modular arithmetic for RNS limbs — the TPU field-arithmetic core.

The reference's HE engine does 64-bit modular arithmetic with native u64/u128
(SEAL ``seal/util/uintarithsmallmod.h``).  TPUs have no 64-bit multiplier, so
this module builds exact modular arithmetic from 32-bit vector ops:

- RNS primes are chosen < 2^31 (see ``hhe_tpu.ops.primes``), so a full 32x32
  product fits in a (hi, lo) pair of u32 computed from four 16x16 partial
  products — pure VPU-friendly integer ops.
- Variable-by-constant and variable-by-variable modular multiplication uses
  Montgomery reduction with R = 2^32; constants (NTT twiddles, key-switch
  factors, plaintext operands) are stored pre-scaled into the Montgomery
  domain so data stays in the standard domain throughout.

Every function is a pure jnp function usable inside jit/vmap/shard_map and
Pallas kernels alike.  ``host`` mirrors the same operations in numpy u64 for
golden-model cross-validation (products of <2^31 values are exact in u64).
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp

U32 = jnp.uint32
MASK16 = np.uint32(0xFFFF)
MASK32 = np.uint64(0xFFFFFFFF)


# ---------------------------------------------------------------------------
# Host-side constant preparation (numpy, exact)
# ---------------------------------------------------------------------------


def mont_constants(q: int):
    """Montgomery constants for modulus q < 2^31 (R = 2^32).

    Returns (qinv_neg, r1, r2): -q^{-1} mod 2^32, R mod q, R^2 mod q.
    """
    q = int(q)
    assert q % 2 == 1 and 1 < q < (1 << 31)
    qinv = pow(q, -1, 1 << 32)
    qinv_neg = ((1 << 32) - qinv) & 0xFFFFFFFF
    r1 = (1 << 32) % q
    r2 = pow(1 << 32, 2, q)
    return np.uint32(qinv_neg), np.uint32(r1), np.uint32(r2)


def to_mont_host(a, q: int) -> np.ndarray:
    """Host: standard -> Montgomery domain (a * 2^32 mod q), exact numpy."""
    a = np.asarray(a, dtype=np.uint64)
    return ((a << np.uint64(32)) % np.uint64(q)).astype(np.uint32)


# ---------------------------------------------------------------------------
# Device-side u32 primitives (jnp)
# ---------------------------------------------------------------------------


def mul32_wide(a, b):
    """Exact 32x32 -> 64-bit product as (hi, lo) u32 pair via 16-bit digits."""
    a = a.astype(U32)
    b = b.astype(U32)
    a0 = a & MASK16
    a1 = a >> 16
    b0 = b & MASK16
    b1 = b >> 16
    p00 = a0 * b0
    p01 = a0 * b1
    p10 = a1 * b0
    p11 = a1 * b1
    mid = (p00 >> 16) + (p01 & MASK16) + (p10 & MASK16)  # < 3*2^16, no overflow
    lo = (p00 & MASK16) | ((mid & MASK16) << 16)
    hi = p11 + (p01 >> 16) + (p10 >> 16) + (mid >> 16)
    return hi, lo


def mont_mul(a, b_mont, q, qinv_neg):
    """Montgomery product: a * b_mont * 2^-32 mod q.

    With b_mont = b * 2^32 mod q this returns a*b mod q in standard domain.
    Requires q < 2^31; a, b_mont < q (or any u32 with a*b < q*2^32).
    """
    hi, lo = mul32_wide(a, b_mont)
    m = lo * qinv_neg  # mod 2^32 (u32 wraparound)
    mhi, _ = mul32_wide(m, q)
    # lo + (m*q)_lo == 0 mod 2^32 by construction; carry-out is 1 iff lo != 0
    carry = (lo != 0).astype(U32)
    t = hi + mhi + carry  # < 2q < 2^32
    return jnp.where(t >= q, t - q, t)


def mont_mul_lazy(a, b_mont, q, qinv_neg):
    """Montgomery product WITHOUT the final conditional subtract: returns
    a * b_mont * 2^-32 mod q in [0, 2q) (Harvey lazy form, cf. SEAL
    ``seal/util/ntt.h:195-251`` which keeps NTT intermediates in [0, 4q)).

    Requires a*b_mont < q*2^32 — with b_mont < q this admits any a < 2^32,
    in particular lazy values in [0, 4q) when q < 2^30."""
    hi, lo = mul32_wide(a, b_mont)
    m = lo * qinv_neg  # mod 2^32 (u32 wraparound)
    mhi, _ = mul32_wide(m, q)
    carry = (lo != 0).astype(U32)
    return hi + mhi + carry  # < 2q


def add_mod(a, b, q):
    s = a + b  # both < q < 2^31 -> no overflow
    return jnp.where(s >= q, s - q, s)


def sub_mod(a, b, q):
    return jnp.where(a >= b, a - b, a + q - b)


def neg_mod(a, q):
    return jnp.where(a == 0, a, q - a)


def tree_add_mod(t, q, axis=0):
    """Log-depth modular sum along ``axis`` (keeps the axis, size 1).

    Replaces sequential accumulate-loops: a J-step Python loop of
    add_mod(acc, mont_mul(...)) lowers to J serially-dependent fused
    kernels (measured 10.2 ms for the BSGS q-part accumulation at
    production shapes, tools/profile_matmul.py round 4) while one batched
    multiply + this log2(J)-pass reduction is bandwidth-bound (~2 ms)."""
    n = t.shape[axis]
    if n & (n - 1):  # pad once to a power of two (0 is the add_mod identity)
        # cheaper than per-level odd-size concats, which materialize copies
        target = 1 << n.bit_length()
        pad = [(0, 0)] * t.ndim
        pad[axis if axis >= 0 else t.ndim + axis] = (0, target - n)
        t = jnp.pad(t, pad)
    while t.shape[axis] > 1:
        half = t.shape[axis] // 2
        a = jax.lax.slice_in_dim(t, 0, half, axis=axis)
        b = jax.lax.slice_in_dim(t, half, 2 * half, axis=axis)
        t = add_mod(a, b, q)
    return t


def to_mont(a, r2_mont, q, qinv_neg):
    """Device: standard -> Montgomery domain via mont_mul with R^2."""
    return mont_mul(a, r2_mont, q, qinv_neg)


def from_mont(a_mont, q, qinv_neg):
    """Device: Montgomery -> standard domain (a_mont * 2^-32 mod q)."""
    m = a_mont * qinv_neg
    mhi, _ = mul32_wide(m, q)
    carry = (a_mont != 0).astype(U32)
    t = mhi + carry
    return jnp.where(t >= q, t - q, t)


# ---------------------------------------------------------------------------
# Host golden model (numpy u64, products exact for q < 2^31)
# ---------------------------------------------------------------------------


class host:
    @staticmethod
    def mul_mod(a, b, q):
        return (np.asarray(a, np.uint64) * np.asarray(b, np.uint64)) % np.uint64(q)

    @staticmethod
    def add_mod(a, b, q):
        return (np.asarray(a, np.uint64) + np.asarray(b, np.uint64)) % np.uint64(q)

    @staticmethod
    def sub_mod(a, b, q):
        qq = np.uint64(q)
        return (np.asarray(a, np.uint64) + qq - np.asarray(b, np.uint64) % qq) % qq

    @staticmethod
    def pow_mod(a, e, q):
        return np.uint64(pow(int(a), int(e), int(q)))
