"""Negacyclic NTT over RNS limbs — the hot kernel of the HE engine.

Replaces SEAL's NTTTables / ntt_negacyclic_harvey (``seal/util/ntt.h``,
``seal/util/dwthandler.h``) with a TPU-native design:

- Merged-ψ iterative NTT (Cooley-Tukey butterflies forward, Gentleman-Sande
  inverse) with twiddle factors stored in bit-reversed order and Montgomery
  form.  Forward maps natural -> bit-reversed order; inverse maps
  bit-reversed -> natural.  All pointwise ciphertext algebra happens in the
  bit-reversed evaluation domain, so no reordering gathers appear anywhere on
  the hot path (SEAL makes the same choice).
- The stage loop is a static Python loop (log2 N stages) over reshaped
  ``[..., k, m, 2, t]`` views: every stage is one fused VPU-wide
  multiply/add/select — XLA fuses the whole transform; shapes are static.
- Tables are per-limb ``[k, N]`` arrays living in HBM, broadcast against
  ciphertext tensors ``[..., k, N]``.

A four-step (128x128) MXU formulation is layered on top for large N in
``hhe_tpu.ops.kernels`` (later optimization); this module is the canonical
semantics.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import modular, primes


def bit_reverse_indices(n: int) -> np.ndarray:
    logn = n.bit_length() - 1
    idx = np.arange(n, dtype=np.int64)
    rev = np.zeros_like(idx)
    for b in range(logn):
        rev |= ((idx >> b) & 1) << (logn - 1 - b)
    return rev


class NttTables(NamedTuple):
    """Per-limb-set NTT tables (device arrays)."""

    q: jnp.ndarray  # [k, 1] u32 moduli
    qinv_neg: jnp.ndarray  # [k, 1] u32  (-q^-1 mod 2^32)
    r2: jnp.ndarray  # [k, 1] u32  (2^64 mod q, for to_mont)
    psi_br: jnp.ndarray  # [k, N] u32 Montgomery-domain psi^bitrev(i)
    ipsi_br: jnp.ndarray  # [k, N] u32 Montgomery-domain psi^-bitrev(i)
    ninv: jnp.ndarray  # [k, 1] u32 Montgomery-domain N^-1


@functools.lru_cache(maxsize=32)
def build_tables(moduli: Tuple[int, ...], n: int) -> NttTables:
    """Host-precomputed tables for the given RNS moduli and polynomial degree."""
    k = len(moduli)
    rev = bit_reverse_indices(n)
    q_arr = np.zeros((k, 1), np.uint32)
    qi_arr = np.zeros((k, 1), np.uint32)
    r2_arr = np.zeros((k, 1), np.uint32)
    psi_t = np.zeros((k, n), np.uint32)
    ipsi_t = np.zeros((k, n), np.uint32)
    ninv_t = np.zeros((k, 1), np.uint32)
    for i, q in enumerate(moduli):
        qinv_neg, r1, r2 = modular.mont_constants(q)
        psi = primes.root_of_unity(2 * n, q)
        ipsi = pow(psi, -1, q)
        pw = np.empty(n, np.uint64)
        ipw = np.empty(n, np.uint64)
        cur, icur = 1, 1
        for j in range(n):
            pw[j] = cur
            ipw[j] = icur
            cur = cur * psi % q
            icur = icur * ipsi % q
        q_arr[i, 0] = q
        qi_arr[i, 0] = qinv_neg
        r2_arr[i, 0] = r2
        psi_t[i] = modular.to_mont_host(pw[rev], q)
        ipsi_t[i] = modular.to_mont_host(ipw[rev], q)
        ninv_t[i, 0] = modular.to_mont_host(np.uint64(pow(n, -1, q)), q)
    tb = NttTables(
        q=jnp.asarray(q_arr),
        qinv_neg=jnp.asarray(qi_arr),
        r2=jnp.asarray(r2_arr),
        psi_br=jnp.asarray(psi_t),
        ipsi_br=jnp.asarray(ipsi_t),
        ninv=jnp.asarray(ninv_t),
    )
    # register moduli so the Pallas backend can rebuild its own tables
    from . import ntt_pallas

    ntt_pallas.MODULI_OF[id(tb)] = moduli
    return tb


import os

_PALLAS_ENABLED = os.environ.get("HHE_NTT_PALLAS", "1") != "0"


def _use_pallas(x, tb) -> bool:
    """Dispatch to the fused Pallas kernel on TPU (bit-identical output)."""
    if not _PALLAS_ENABLED:
        return False
    try:
        if jax.default_backend() != "tpu":
            return False
    except Exception:  # pragma: no cover
        return False
    from . import ntt_pallas

    return ntt_pallas.supported(x.shape, tb)


def ntt_fwd(x: jnp.ndarray, tb: NttTables) -> jnp.ndarray:
    """Forward negacyclic NTT, natural -> bit-reversed order.

    x: u32 [..., k, N] in standard domain; returns same shape/domain.
    On TPU dispatches to the fused Pallas kernel (``ntt_pallas``); the
    XLA butterfly path below is the canonical semantics.
    """
    if _use_pallas(x, tb):
        from . import ntt_pallas

        return ntt_pallas.ntt_fwd(x, tb)
    return _ntt_fwd_xla(x, tb)


def ntt_inv(x: jnp.ndarray, tb: NttTables) -> jnp.ndarray:
    """Inverse negacyclic NTT, bit-reversed -> natural order."""
    if _use_pallas(x, tb):
        from . import ntt_pallas

        return ntt_pallas.ntt_inv(x, tb)
    return _ntt_inv_xla(x, tb)


@jax.jit
def _ntt_fwd_xla(x: jnp.ndarray, tb: NttTables) -> jnp.ndarray:
    """XLA butterfly forward NTT (Longa-Naehrig Algorithm 1 structure,
    CT butterflies, merged psi)."""
    *lead, k, n = x.shape
    t = n
    m = 1
    q = tb.q[..., None]  # [k,1,1]
    qi = tb.qinv_neg[..., None]
    while m < n:
        t //= 2
        xv = x.reshape(*lead, k, m, 2, t)
        s = tb.psi_br[:, m : 2 * m].reshape(k, m, 1)
        u = xv[..., 0, :]
        v = modular.mont_mul(xv[..., 1, :], s, q, qi)
        x = jnp.stack(
            [modular.add_mod(u, v, q), modular.sub_mod(u, v, q)], axis=-2
        ).reshape(*lead, k, n)
        m *= 2
    return x


@jax.jit
def _ntt_inv_xla(x: jnp.ndarray, tb: NttTables) -> jnp.ndarray:
    """XLA butterfly inverse NTT (GS butterflies)."""
    *lead, k, n = x.shape
    t = 1
    m = n
    q = tb.q[..., None]
    qi = tb.qinv_neg[..., None]
    while m > 1:
        h = m // 2
        xv = x.reshape(*lead, k, h, 2, t)
        s = tb.ipsi_br[:, h : 2 * h].reshape(k, h, 1)
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        x = jnp.stack(
            [
                modular.add_mod(u, v, q),
                modular.mont_mul(modular.sub_mod(u, v, q), s, q, qi),
            ],
            axis=-2,
        ).reshape(*lead, k, n)
        t *= 2
        m = h
    return modular.mont_mul(x, tb.ninv, tb.q, tb.qinv_neg)


def pointwise_mont(a: jnp.ndarray, b_mont: jnp.ndarray, tb: NttTables) -> jnp.ndarray:
    """Pointwise a*b where b is already in Montgomery domain."""
    return modular.mont_mul(a, b_mont, tb.q, tb.qinv_neg)


def to_mont(a: jnp.ndarray, tb: NttTables) -> jnp.ndarray:
    return modular.mont_mul(a, tb.r2, tb.q, tb.qinv_neg)


@jax.jit
def negacyclic_mul(a: jnp.ndarray, b: jnp.ndarray, tb: NttTables) -> jnp.ndarray:
    """Full negacyclic polynomial product (both inputs standard domain, coeff order)."""
    fa = ntt_fwd(a, tb)
    fb = ntt_fwd(to_mont(b, tb), tb)
    return ntt_inv(pointwise_mont(fa, fb, tb), tb)


# ------------------------------------------------------------------
# Host (numpy u64) fast NTT — used by keygen/encrypt/decrypt which run
# party-side on CPU; exact since all products are of values < 2^31.
# ------------------------------------------------------------------


class HostTables(NamedTuple):
    q: int
    psi_br: np.ndarray  # [N] u64, standard domain, bit-reversed powers
    ipsi_br: np.ndarray
    ninv: int


@functools.lru_cache(maxsize=64)
def build_host_tables(q: int, n: int) -> HostTables:
    """q may exceed 2^32 (e.g. the reference speedtest's 47-bit plaintext
    modulus, ``qat/src/speedtest_he_mnist_works.py:396``): tables then use
    object dtype and the host NTT runs in exact Python integers."""
    rev = bit_reverse_indices(n)
    psi = primes.root_of_unity(2 * n, q)
    ipsi = pow(psi, -1, q)
    dt = np.uint64 if q < (1 << 32) else object
    pw = np.empty(n, dt)
    ipw = np.empty(n, dt)
    cur, icur = 1, 1
    for j in range(n):
        pw[j] = cur
        ipw[j] = icur
        cur = cur * psi % q
        icur = icur * ipsi % q
    return HostTables(q, pw[rev].copy(), ipw[rev].copy(), pow(n, -1, q))


def ntt_fwd_host(x: np.ndarray, tb: HostTables) -> np.ndarray:
    """Forward negacyclic NTT on host, natural -> bit-reversed ([..., N] u64;
    object dtype — exact bigint — when q >= 2^32)."""
    if tb.q >= (1 << 32):
        x = np.asarray(x, object) % tb.q
        q = tb.q
    else:
        x = np.asarray(x, np.uint64) % np.uint64(tb.q)
        q = np.uint64(tb.q)
    *lead, n = x.shape
    t, m = n, 1
    while m < n:
        t //= 2
        xv = x.reshape(*lead, m, 2, t)
        s = tb.psi_br[m : 2 * m].reshape(m, 1)
        u = xv[..., 0, :]
        v = (xv[..., 1, :] * s) % q
        x = np.stack([(u + v) % q, (u + q - v) % q], axis=-2).reshape(*lead, n)
        m *= 2
    return x


def ntt_inv_host(x: np.ndarray, tb: HostTables) -> np.ndarray:
    """Inverse negacyclic NTT on host, bit-reversed -> natural."""
    if tb.q >= (1 << 32):
        x = np.asarray(x, object)
        q = tb.q
    else:
        x = np.asarray(x, np.uint64)
        q = np.uint64(tb.q)
    *lead, n = x.shape
    t, m = 1, n
    while m > 1:
        h = m // 2
        xv = x.reshape(*lead, h, 2, t)
        s = tb.ipsi_br[h : 2 * h].reshape(h, 1)
        u = xv[..., 0, :]
        v = xv[..., 1, :]
        x = np.stack(
            [(u + v) % q, ((u + q - v) % q * s) % q], axis=-2
        ).reshape(*lead, n)
        t *= 2
        m = h
    ninv = tb.ninv if tb.q >= (1 << 32) else np.uint64(tb.ninv)
    return (x * ninv) % q


def poly_mul_host(a: np.ndarray, b: np.ndarray, q: int) -> np.ndarray:
    """Negacyclic a*b mod q on host via NTT ([..., N])."""
    tb = build_host_tables(q, a.shape[-1])
    fa = ntt_fwd_host(a, tb)
    fb = ntt_fwd_host(b, tb)
    return ntt_inv_host((fa * fb) % np.uint64(q), tb)


# ------------------------------------------------------------------
# Host golden model (numpy, schoolbook negacyclic convolution)
# ------------------------------------------------------------------


def negacyclic_mul_host(a: np.ndarray, b: np.ndarray, q: int) -> np.ndarray:
    """O(N^2) reference negacyclic product mod q for cross-validation."""
    n = a.shape[-1]
    a = np.asarray(a, np.uint64)
    b = np.asarray(b, np.uint64)
    res = np.zeros(n, dtype=object)
    ai = [int(v) for v in a]
    bi = [int(v) for v in b]
    for i in range(n):
        s = 0
        for j in range(i + 1):
            s += ai[j] * bi[i - j]
        for j in range(i + 1, n):
            s -= ai[j] * bi[n + i - j]
        res[i] = s % q
    return res.astype(np.uint64)
