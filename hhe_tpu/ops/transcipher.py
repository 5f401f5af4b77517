"""Homomorphic PASTA-3 transcipher — the heart of HHE.

TPU-native re-design of ``PASTA_SEAL`` (reference
``src/pasta/pasta_3_seal.{h,cpp}``): homomorphically evaluates PASTA-3
decryption on the HE-encrypted symmetric key, converting PASTA ciphertexts
into BFV ciphertexts ("decomposition", reference ``pasta_3_seal.cpp:106-172``).

TPU-first structure (not a port):

- All SHAKE-derived round material (matrices as rotation diagonals, round
  constants) is **host-precomputed per (nonce, block)** and shipped to the
  device as stacked plaintext tensors ``[4, T, k, N]`` — the device never
  touches Keccak.
- The diagonal matmul's 127 sequential rotations run as a ``lax.scan`` so
  the whole 3-round keystream evaluation jit-compiles to one XLA program.
- The keystream ciphertext depends only on (key, nonce, block) — NOT on the
  data — so it is computed once and cached; decomposing a *batch* of B
  samples is then B cheap negate+add_plain ops (the reference re-evaluates
  the full transcipher per record, ``CSP.cpp:247-252``).

Packing (reference ``pasta_3_seal.cpp:8-21``): PASTA key/state halves live at
slots ``[0..T)`` (row 0) and ``[N/2..N/2+T)`` (row 1); `mix` is a column swap;
with N/2 != T the state is replicated at ``[N/2-T..N/2)`` before each matmul
so rotate-by-(-1) acts cyclically on the T-window (``pasta_3_seal.cpp:380-385``).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import bfv, bfv_eval, pasta
from .bfv import Ciphertext, Context, KSwitchKey, PublicKey
from .modular import add_mod

T = pasta.PASTA_T


def galois_elts(ctx: Context) -> List[int]:
    """Galois elements the transcipher needs (reference add_gk_indices,
    ``pasta_3_seal.cpp:190-201``): rotate -1, column swap, and +T when the
    packing is not full."""
    elts = [ctx.galois_elt_from_step(-1), 2 * ctx.n - 1]
    if ctx.n // 2 != T:
        elts.append(ctx.galois_elt_from_step(T))
    return elts


class Transcipher:
    """Evaluates PASTA-3 decryption under BFV (one instance per context+keys)."""

    def __init__(self, ctx: Context, rk: KSwitchKey, gks: Dict[int, KSwitchKey]):
        self.ctx = ctx
        self.rk = rk
        self.g_neg1 = ctx.galois_elt_from_step(-1)
        self.g_cols = 2 * ctx.n - 1
        self.g_t = ctx.galois_elt_from_step(T) if ctx.n // 2 != T else None
        self.gk_neg1 = gks[self.g_neg1]
        self.gk_cols = gks[self.g_cols]
        self.gk_t = gks[self.g_t] if self.g_t is not None else gks[self.g_neg1]
        half = ctx.n // 2
        mask = np.zeros(half + T, np.int64)
        mask[1:T] = 1
        mask[half + 1 : half + T] = 1
        self.feistel_mask = ctx.plain_for_mul(ctx.encode(mask))
        self._pt_cache: Dict[Tuple[int, int], Tuple[jnp.ndarray, jnp.ndarray]] = {}
        self._ks_cache: Dict[Tuple[int, int, int], Ciphertext] = {}
        self._jit_keystream = jax.jit(self._keystream_impl)

    # ------------------------------------------------------------------
    # Key encryption (reference encrypt_key_2 / pastahelper::encrypt_symmetric_key)
    # ------------------------------------------------------------------

    def encrypt_key(self, pk: PublicKey, key: np.ndarray) -> Ciphertext:
        key = np.asarray(key, np.uint64)
        assert key.shape == (pasta.KEY_SIZE,)
        half = self.ctx.n // 2
        vec = np.zeros(half + T, np.int64)
        vec[:T] = key[:T]
        vec[half : half + T] = key[T:]
        return self.ctx.encrypt(pk, self.ctx.encode(vec))

    # ------------------------------------------------------------------
    # Host-precomputed per-block plaintext material
    # ------------------------------------------------------------------

    def block_plaintexts(self, nonce: int, b: int) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(mats_pt [4, T, k, N] NTT+Mont diagonals, rcs_pt [4, k, N] scaled)."""
        kcache = (nonce, b)
        if kcache in self._pt_cache:
            return self._pt_cache[kcache]
        ctx = self.ctx
        half = ctx.n // 2
        mats1, mats2, rcs1, rcs2 = pasta.block_randomness(ctx.t, nonce, b)
        i_idx = np.arange(T)[:, None]
        j_idx = np.arange(T)[None, :]
        sel = (j_idx + T - i_idx) % T  # diag i entry j: mat[j][(j+T-i)%T]
        diag_vecs = np.zeros((4, T, half + T), np.uint64)
        rc_vecs = np.zeros((4, half + T), np.uint64)
        for r in range(4):
            diag_vecs[r, :, :T] = mats1[r][j_idx, sel]
            diag_vecs[r, :, half : half + T] = mats2[r][j_idx, sel]
            rc_vecs[r, :T] = rcs1[r]
            rc_vecs[r, half : half + T] = rcs2[r]
        mats_polys = ctx.encode_batch(diag_vecs.reshape(4 * T, half + T))
        mats_pt = ctx.plain_for_mul_batch(mats_polys).reshape(4, T, ctx.k, ctx.n)
        rcs_pt = ctx.plain_for_add_batch(ctx.encode_batch(rc_vecs))
        out = (mats_pt, rcs_pt)
        self._pt_cache[kcache] = out
        return out

    # ------------------------------------------------------------------
    # Homomorphic building blocks (jit-traced)
    # ------------------------------------------------------------------

    def _keys(self):
        """Key pytree passed into the jitted keystream (NOT closed over, so
        re-keygen doesn't change the traced graph / bust the compile cache)."""
        return (self.rk, self.gk_neg1, self.gk_t, self.gk_cols)

    def _matmul(self, st: Ciphertext, mats: jnp.ndarray, keys) -> Ciphertext:
        """Packed two-matrix diagonal product (reference diagonal,
        ``pasta_3_seal.cpp:370-413``) with the rotation loop as lax.scan."""
        ctx = self.ctx
        _, gk_neg1, gk_t, _ = keys
        if self.g_t is not None:
            st = bfv_eval.add(ctx, st, bfv_eval.apply_galois(ctx, st, self.g_t, gk_t))
        acc = bfv_eval.multiply_plain(ctx, st, mats[0])

        def body(carry, diag):
            state, acc = carry
            state = bfv_eval.apply_galois(ctx, state, self.g_neg1, gk_neg1)
            acc = bfv_eval.add(ctx, acc, bfv_eval.multiply_plain(ctx, state, diag))
            return (state, acc), None

        (_, acc), _ = lax.scan(body, (st, acc), mats[1:])
        return acc

    def _mix(self, st: Ciphertext, keys) -> Ciphertext:
        """(2 1; 1 2) over the two rows (reference mix, rotate_columns + adds)."""
        ctx = self.ctx
        tmp = bfv_eval.add(ctx, bfv_eval.apply_galois(ctx, st, self.g_cols, keys[3]), st)
        return bfv_eval.add(ctx, st, tmp)

    def _sbox_feistel(self, st: Ciphertext, keys) -> Ciphertext:
        """state[i] += state[i-1]^2 (reference sbox_feistel: rotate, mask,
        square, relinearize, add)."""
        ctx = self.ctx
        rot = bfv_eval.apply_galois(ctx, st, self.g_neg1, keys[1])
        rot = bfv_eval.multiply_plain(ctx, rot, self.feistel_mask)
        rot = bfv_eval.relinearize(ctx, bfv_eval.square(ctx, rot), keys[0])
        return bfv_eval.add(ctx, st, rot)

    def _keystream_impl(self, key_data, mats_pt, rcs_pt, keys) -> jnp.ndarray:
        """Full 3-round PASTA keystream evaluation on the encrypted key."""
        ctx = self.ctx
        st = Ciphertext(key_data)
        for r in range(4):
            st = self._matmul(st, mats_pt[r], keys)
            st = bfv_eval.add_plain(ctx, st, rcs_pt[r])
            st = self._mix(st, keys)
            if r < 2:
                st = self._sbox_feistel(st, keys)
            elif r == 2:
                st = bfv_eval.exponentiate(ctx, st, 3, keys[0])
        return st.data

    # ------------------------------------------------------------------
    # Public API
    # ------------------------------------------------------------------

    def keystream_ct(self, enc_key: Ciphertext, nonce: int, b: int) -> Ciphertext:
        """BFV ciphertext of the PASTA keystream for block b (cached)."""
        ck = (id(enc_key.data), nonce, b)
        if ck not in self._ks_cache:
            mats_pt, rcs_pt = self.block_plaintexts(nonce, b)
            self._ks_cache[ck] = Ciphertext(
                self._jit_keystream(enc_key.data, mats_pt, rcs_pt, self._keys())
            )
        return self._ks_cache[ck]

    def decompose(
        self, enc_key: Ciphertext, sym_ct, nonce: int = pasta.NONCE
    ) -> List[Ciphertext]:
        """PASTA ciphertexts -> BFV ciphertexts (reference decomposition).

        sym_ct: [L] or [B, L] u64.  Returns one ciphertext per 128-block; for
        batched input each has data shape [2, B, k, N]."""
        ctx = self.ctx
        sym = np.asarray(sym_ct, np.uint64)
        batched = sym.ndim == 2
        sym2 = np.atleast_2d(sym)
        B, L = sym2.shape
        nblocks = math.ceil(L / T)
        out = []
        for b in range(nblocks):
            ks = self.keystream_ct(enc_key, nonce, b)
            neg = bfv_eval.negate(ctx, ks)
            chunk = sym2[:, b * T : min((b + 1) * T, L)]
            pts = ctx.plain_for_add_batch(ctx.encode_batch(chunk))  # [B,k,N]
            if batched:
                c0 = add_mod(neg.data[0][None], pts, ctx.tb_q.q)
                c1 = jnp.broadcast_to(neg.data[1][None], c0.shape)
                out.append(Ciphertext(jnp.stack([c0, c1])))
            else:
                c0 = add_mod(neg.data[0], pts[0], ctx.tb_q.q)
                out.append(Ciphertext(jnp.stack([c0, neg.data[1]])))
        return out
