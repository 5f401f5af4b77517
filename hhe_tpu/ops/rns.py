"""RNS base machinery: CRT compose/decompose and fast base conversion.

TPU-native replacement for SEAL's ``RNSBase`` / ``BaseConverter`` / ``RNSTool``
(reference ``libs/seal/include/SEAL-4.0/seal/util/rns.h:22,129,190``).  The
host side uses exact Python bigints (CRT, constants); the device side runs
fast base conversion (FBC) as vectorized u32 Montgomery arithmetic, the
building block of BFV ct x ct multiply and decryption scaling.

FBC from base A = {a_1..a_k} to modulus c:
    y_c = sum_j [x_j * (A/a_j)^{-1}]_{a_j} * (A/a_j)  mod c
which equals x + alpha*A for a small overflow 0 <= alpha < k (the classic
approximate conversion; exactness where needed is restored by the m_tilde /
Shenoy-Kumaresan corrections in ``bfv_eval``).
"""

from __future__ import annotations

import functools
import math
from typing import NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from . import modular


# ---------------------------------------------------------------------------
# Host bigint CRT
# ---------------------------------------------------------------------------


class RnsBase:
    """A fixed ordered set of coprime moduli with host CRT precomputation."""

    def __init__(self, moduli: Sequence[int]):
        self.moduli: Tuple[int, ...] = tuple(int(m) for m in moduli)
        self.k = len(self.moduli)
        self.Q = math.prod(self.moduli)
        self.tilde = [self.Q // m for m in self.moduli]  # Q/a_j
        self.inv = [pow(t, -1, m) for t, m in zip(self.tilde, self.moduli)]
        # CRT units u_j = tilde_j * inv_j  (== 1 mod a_j, == 0 mod a_i)
        self.unit = [t * i for t, i in zip(self.tilde, self.inv)]

    def decompose(self, x) -> np.ndarray:
        """Integers (any shape, Python ints / object array) -> u32 [k, ...]."""
        arr = np.asarray(x, dtype=object)
        out = np.empty((self.k,) + arr.shape, np.uint32)
        for j, m in enumerate(self.moduli):
            out[j] = (arr % m).astype(np.uint64).astype(np.uint32)
        return out

    def compose(self, x_rns: np.ndarray) -> np.ndarray:
        """u32/u64 [k, ...] -> object array of exact integers in [0, Q)."""
        x = np.asarray(x_rns, np.uint64)
        acc = np.zeros(x.shape[1:], dtype=object)
        for j in range(self.k):
            acc += x[j].astype(object) * self.unit[j]
        return acc % self.Q

    def compose_centered(self, x_rns: np.ndarray) -> np.ndarray:
        v = self.compose(x_rns)
        half = self.Q // 2
        return np.where(v > half, v - self.Q, v)


# ---------------------------------------------------------------------------
# Device fast base conversion
# ---------------------------------------------------------------------------


class FBC(NamedTuple):
    """Constants for FBC from base A (ka moduli) to base C (kc moduli)."""

    a_q: jnp.ndarray  # [ka, 1] u32
    a_qinv: jnp.ndarray  # [ka, 1] u32
    inv_mont: jnp.ndarray  # [ka, 1] u32   (A/a_j)^-1 mod a_j, Mont(a_j)
    c_q: jnp.ndarray  # [kc, 1] u32
    c_qinv: jnp.ndarray  # [kc, 1] u32
    m_mont: jnp.ndarray  # [ka, kc] u32   (A/a_j) mod c, Mont(c)


def build_fbc(src: RnsBase, dst_moduli: Sequence[int]) -> FBC:
    dst = tuple(int(m) for m in dst_moduli)
    ka, kc = src.k, len(dst)
    a_q = np.array(src.moduli, np.uint32).reshape(ka, 1)
    a_qi = np.zeros((ka, 1), np.uint32)
    invm = np.zeros((ka, 1), np.uint32)
    for j, m in enumerate(src.moduli):
        qinv_neg, _, _ = modular.mont_constants(m)
        a_qi[j, 0] = qinv_neg
        invm[j, 0] = modular.to_mont_host(np.uint64(src.inv[j]), m)
    c_q = np.array(dst, np.uint32).reshape(kc, 1)
    c_qi = np.zeros((kc, 1), np.uint32)
    mm = np.zeros((ka, kc), np.uint32)
    for i, c in enumerate(dst):
        qinv_neg, _, _ = modular.mont_constants(c)
        c_qi[i, 0] = qinv_neg
        for j in range(ka):
            mm[j, i] = modular.to_mont_host(np.uint64(src.tilde[j] % c), c)
    return FBC(
        jnp.asarray(a_q), jnp.asarray(a_qi), jnp.asarray(invm),
        jnp.asarray(c_q), jnp.asarray(c_qi), jnp.asarray(mm),
    )


def fbc_digits(x: jnp.ndarray, f: FBC) -> jnp.ndarray:
    """tmp_j = [x_j * (A/a_j)^{-1}]_{a_j}: x [..., ka, N] -> same shape."""
    return modular.mont_mul(x, f.inv_mont, f.a_q, f.a_qinv)


def fbc_from_digits(tmp: jnp.ndarray, f: FBC, chunk: int = 4) -> jnp.ndarray:
    """FBC given precomputed digits: [..., ka, N] -> [..., kc, N].

    Batched [..., chunk, kc, N] multiplies + log-depth tree reductions,
    accumulated over ceil(ka/chunk) groups — the previous ka-step serial
    accumulate chain was kernel-launch-bound (the pathology measured at
    10.2 ms in the BSGS accumulation, tools/profile_matmul.py round 4),
    while a single fully-batched [..., ka, kc, N] tensor was measured to
    RESOURCE_EXHAUST the 16 GB chip inside the batched fc1 relinearize
    (leading dims [B, row_chunk] multiply the ka x kc blow-up)."""
    ka = tmp.shape[-2]
    acc = None
    for s in range(0, ka, chunk):
        part = modular.mont_mul(
            tmp[..., s : s + chunk, None, :],
            f.m_mont[s : s + chunk, :, None],
            f.c_q,
            f.c_qinv,
        )  # [..., <=chunk, kc, N]
        part = modular.tree_add_mod(part, f.c_q, axis=-3)[..., 0, :, :]
        acc = part if acc is None else modular.add_mod(acc, part, f.c_q)
    return acc


def fbc_apply(x: jnp.ndarray, f: FBC) -> jnp.ndarray:
    """Approximate base conversion A -> C: result == x + alpha*A (alpha < ka)."""
    return fbc_from_digits(fbc_digits(x, f), f)


def fbc_digits_to_pow2(tmp: jnp.ndarray, tilde_mod: np.ndarray, bits: int) -> jnp.ndarray:
    """FBC digits -> a power-of-two modulus 2^bits (bits <= 16): masked u32 ops."""
    mask = np.uint32((1 << bits) - 1)
    # u32 wraparound sums are exact mod 2^bits, so one batched multiply +
    # plain sum replaces the ka-step serial masked-accumulate chain
    t = (tmp & mask) * jnp.asarray(np.asarray(tilde_mod, np.uint32))[:, None]
    return t.sum(axis=-2) & mask


def reduce_u32(x: jnp.ndarray, q: jnp.ndarray) -> jnp.ndarray:
    """Reduce u32 values < 2^31 modulo q (q >= 2^29): <= 3 conditional subtracts."""
    r = x
    for _ in range(3):
        r = jnp.where(r >= q, r - q, r)
    return r
