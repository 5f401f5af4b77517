"""Four-step NTT on the MXU: modular DFT as int8 digit matmuls.

The butterfly NTT in ``ops/ntt.py`` runs on the VPU (elementwise u32
Montgomery ops).  TPU FLOPs live in the 128x128 MXU, which multiplies
int8 x int8 -> int32 exactly — so this module reformulates the negacyclic
NTT as matrix products:

    out[j] = sum_i x[i] psi^(i(2j+1))  =  DFT_N(x * psi^i)[j]

with DFT_N decomposed four-step over N = n1*n2 (n1 = n2 = 128 at N=16384,
matching the MXU tile exactly):

    A = M @ W2          (batched per RNS modulus)
    B = A * twiddle
    O = W1 @ B

Operands are split into 6-bit digits (both < 64, so int8 products of
128-term rows accumulate exactly in int32: 63*63*128*6 < 2^22), partial
products recombined with Montgomery multiplications by 2^(6s) mod q.
Outputs are permuted to the same bit-reversed order as ``ntt.ntt_fwd`` so
the two implementations are interchangeable everywhere (verified exactly).

**Backend decision (measured, TPU v5e, slope method on [13,14,16384]):**
fused Pallas butterflies (``ntt_pallas``) fwd 1.02 ms / inv 2.34 ms;
this MXU formulation fwd 6.40 ms / inv 6.63 ms — the 6-bit digit
split-and-recombine (25 digit-pair matmuls + Montgomery recombination per
transform) costs more than the MXU saves.  ``ntt.py`` therefore dispatches
to the Pallas kernel; this module is QUARANTINED as a documented,
exact-tested alternative (tests/test_modular_ntt.py keeps it honest) and
is not on any product path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from . import modular, ntt, primes

DIGIT_BITS = 6
DIGIT_MASK = (1 << DIGIT_BITS) - 1


def _n_digits(moduli) -> int:
    return (max(int(m).bit_length() for m in moduli) + DIGIT_BITS - 1) // DIGIT_BITS


def _digits_host(a: np.ndarray, nd: int) -> np.ndarray:
    """u64 [..., r, c] -> int8 [nd, ..., r, c] of 6-bit digits."""
    out = np.empty((nd,) + a.shape, np.int8)
    v = a.astype(np.uint64)
    for d in range(nd):
        out[d] = ((v >> np.uint64(DIGIT_BITS * d)) & np.uint64(DIGIT_MASK)).astype(
            np.int8
        )
    return out


class MxuNttTables(NamedTuple):
    q: jnp.ndarray  # [k,1]
    qinv_neg: jnp.ndarray
    n1: int
    n2: int
    nd: int
    # forward
    pre_mont: jnp.ndarray  # [k, N] Mont(psi^i)
    w2_digits: jnp.ndarray  # int8 [nd, k, n2, n2]
    tw_mont: jnp.ndarray  # [k, n1, n2]
    w1_digits: jnp.ndarray  # int8 [nd, k, n1, n1]
    pow_mont: jnp.ndarray  # [2*nd-1, k, 1, 1] Mont(2^(6s))
    rev: jnp.ndarray  # [N] bit-reversal permutation (self-inverse)
    # inverse
    w1i_digits: jnp.ndarray
    twi_mont: jnp.ndarray
    w2i_digits: jnp.ndarray
    post_mont: jnp.ndarray  # [k, N] Mont(psi^-i / N)


@functools.lru_cache(maxsize=16)
def build_tables(moduli: Tuple[int, ...], n: int) -> MxuNttTables:
    n1 = n2 = 1 << (n.bit_length() - 1) // 2
    while n1 * n2 < n:
        n1 *= 2
    assert n1 * n2 == n, (n1, n2, n)
    k = len(moduli)
    nd = _n_digits(moduli)
    rev = ntt.bit_reverse_indices(n)

    pre = np.empty((k, n), np.uint64)
    post = np.empty((k, n), np.uint64)
    w2 = np.empty((k, n2, n2), np.uint64)
    tw = np.empty((k, n1, n2), np.uint64)
    w1 = np.empty((k, n1, n1), np.uint64)
    w1i = np.empty((k, n1, n1), np.uint64)
    twi = np.empty((k, n1, n2), np.uint64)
    w2i = np.empty((k, n2, n2), np.uint64)
    pows = np.empty((2 * nd - 1, k), np.uint64)

    i1g, i2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    for t, q in enumerate(moduli):
        psi = primes.root_of_unity(2 * n, q)
        om = psi * psi % q
        omi = pow(om, -1, q)
        i = np.arange(n, dtype=object)
        pre[t] = np.array(
            [pow(psi, int(v), q) for v in range(n)], np.uint64
        )
        ipsi = pow(psi, -1, q)
        ninv = pow(n, -1, q)
        post[t] = np.array(
            [pow(ipsi, int(v), q) * ninv % q for v in range(n)], np.uint64
        )
        # W2[i2, j2] = om^(n1 i2 j2); W1[j1, i1] = om^(n2 i1 j1) (symmetric)
        r2 = pow(om, n1, q)
        r1 = pow(om, n2, q)
        pw_r2 = np.array([pow(r2, int(v), q) for v in range(n2)], np.uint64)
        pw_r1 = np.array([pow(r1, int(v), q) for v in range(n1)], np.uint64)
        pw_om = np.array([pow(om, int(v), q) for v in range(max(n1, n2))], np.uint64)
        idx2 = np.outer(np.arange(n2), np.arange(n2)) % n2
        idx1 = np.outer(np.arange(n1), np.arange(n1)) % n1
        w2[t] = pw_r2[idx2]
        w1[t] = pw_r1[idx1]
        tw[t] = np.array(
            [[pow(om, int(a * b), q) for b in range(n2)] for a in range(n1)],
            np.uint64,
        )
        r2i = pow(r2, -1, q)
        r1i = pow(r1, -1, q)
        pw_r2i = np.array([pow(r2i, int(v), q) for v in range(n2)], np.uint64)
        pw_r1i = np.array([pow(r1i, int(v), q) for v in range(n1)], np.uint64)
        w2i[t] = pw_r2i[idx2]
        w1i[t] = pw_r1i[idx1]
        twi[t] = np.array(
            [[pow(omi, int(a * b), q) for b in range(n2)] for a in range(n1)],
            np.uint64,
        )
        for s in range(2 * nd - 1):
            pows[s, t] = pow(2, DIGIT_BITS * s, q)

    def mont(a, shape_tail):
        out = np.empty_like(a)
        for t, q in enumerate(moduli):
            out[t] = modular.to_mont_host(a[t], q)
        return jnp.asarray(out.astype(np.uint32))

    q_arr = np.array(moduli, np.uint32).reshape(k, 1)
    qi_arr = np.array(
        [modular.mont_constants(q)[0] for q in moduli], np.uint32
    ).reshape(k, 1)
    pow_mont = np.empty((2 * nd - 1, k), np.uint64)
    for s in range(2 * nd - 1):
        for t, q in enumerate(moduli):
            pow_mont[s, t] = int(modular.to_mont_host(pows[s, t], q))
    return MxuNttTables(
        q=jnp.asarray(q_arr),
        qinv_neg=jnp.asarray(qi_arr),
        n1=n1,
        n2=n2,
        nd=nd,
        pre_mont=mont(pre, None),
        w2_digits=jnp.asarray(_digits_host(w2, nd)),
        tw_mont=mont(tw, None),
        w1_digits=jnp.asarray(_digits_host(w1, nd)),
        pow_mont=jnp.asarray(pow_mont.astype(np.uint32)).reshape(2 * nd - 1, k, 1, 1),
        rev=jnp.asarray(rev),
        w1i_digits=jnp.asarray(_digits_host(w1i, nd)),
        twi_mont=mont(twi, None),
        w2i_digits=jnp.asarray(_digits_host(w2i, nd)),
        post_mont=mont(post, None),
    )


def _digits_dev(x: jnp.ndarray, nd: int) -> jnp.ndarray:
    """u32 [..., r, c] -> int8 [nd, ..., r, c]."""
    return jnp.stack(
        [
            ((x >> np.uint32(DIGIT_BITS * d)) & np.uint32(DIGIT_MASK)).astype(jnp.int8)
            for d in range(nd)
        ]
    )


def _modmat_right(m: jnp.ndarray, w_digits: jnp.ndarray, tb: MxuNttTables) -> jnp.ndarray:
    """(m @ W) mod q, batched over the k axis: m u32 [..., k, r, c],
    w_digits int8 [nd, k, c, c2] -> u32 [..., k, r, c2]."""
    nd = tb.nd
    md = _digits_dev(m, nd)
    acc = None
    for s in range(2 * nd - 1):
        p = None
        for d in range(max(0, s - nd + 1), min(nd, s + 1)):
            t = jnp.einsum(
                "...krc,kcl->...krl", md[d], w_digits[s - d],
                preferred_element_type=jnp.int32,
            )
            p = t if p is None else p + t
        term = modular.mont_mul(
            p.astype(jnp.uint32), tb.pow_mont[s], tb.q[..., None], tb.qinv_neg[..., None]
        )
        acc = term if acc is None else modular.add_mod(acc, term, tb.q[..., None])
    return acc


def _modmat_left(w_digits: jnp.ndarray, m: jnp.ndarray, tb: MxuNttTables) -> jnp.ndarray:
    """(W @ m) mod q: w_digits int8 [nd, k, r, c], m u32 [..., k, c, c2]."""
    nd = tb.nd
    md = _digits_dev(m, nd)
    acc = None
    for s in range(2 * nd - 1):
        p = None
        for d in range(max(0, s - nd + 1), min(nd, s + 1)):
            t = jnp.einsum(
                "krc,...kcl->...krl", w_digits[s - d], md[d],
                preferred_element_type=jnp.int32,
            )
            p = t if p is None else p + t
        term = modular.mont_mul(
            p.astype(jnp.uint32), tb.pow_mont[s], tb.q[..., None], tb.qinv_neg[..., None]
        )
        acc = term if acc is None else modular.add_mod(acc, term, tb.q[..., None])
    return acc


def ntt_fwd(x: jnp.ndarray, tb: MxuNttTables) -> jnp.ndarray:
    """Forward negacyclic NTT, natural -> bit-reversed (== ntt.ntt_fwd)."""
    *lead, k, n = x.shape
    n1, n2 = tb.n1, tb.n2
    q2, qi2 = tb.q[..., None], tb.qinv_neg[..., None]
    y = modular.mont_mul(x, tb.pre_mont, tb.q, tb.qinv_neg)
    m = jnp.swapaxes(y.reshape(*lead, k, n2, n1), -1, -2)  # [.., k, n1, n2]
    a = _modmat_right(m, tb.w2_digits, tb)
    b = modular.mont_mul(a, tb.tw_mont, q2, qi2)
    o = _modmat_left(tb.w1_digits, b, tb)
    out = o.reshape(*lead, k, n)
    return jnp.take(out, tb.rev, axis=-1)


def ntt_inv(x: jnp.ndarray, tb: MxuNttTables) -> jnp.ndarray:
    """Inverse negacyclic NTT, bit-reversed -> natural (== ntt.ntt_inv)."""
    *lead, k, n = x.shape
    n1, n2 = tb.n1, tb.n2
    q2, qi2 = tb.q[..., None], tb.qinv_neg[..., None]
    nat = jnp.take(x, tb.rev, axis=-1)
    j = nat.reshape(*lead, k, n1, n2)  # rows j1
    c = _modmat_left(tb.w1i_digits, j, tb)
    d = modular.mont_mul(c, tb.twi_mont, q2, qi2)
    xm = _modmat_right(d, tb.w2i_digits, tb)  # [.., k, n1(i1), n2(i2)]
    out = jnp.swapaxes(xm, -1, -2).reshape(*lead, k, n)
    return modular.mont_mul(out, tb.post_mont, tb.q, tb.qinv_neg)
