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

import collections
import functools
import math
import os
from typing import Dict, List, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax

from . import bfv, bfv_eval, ntt, pasta, rns
from .bfv import Ciphertext, Context, KSwitchKey, PublicKey
from .modular import add_mod, mont_mul, neg_mod

T = pasta.PASTA_T
# The reference fixes N1=16, N2=8 (``pasta_3_seal.h:34-35``); any n1*n2 = 128
# split is bit-equivalent.  32x4 measured fastest on TPU v5e: batched
# babysteps are cheap (pointwise math + small gathers) while every extra
# giantstep costs a digit-decomposition NTT set, so a baby-heavy split wins.
BSGS_N1 = 32
BSGS_N2 = 4


def galois_elts(
    ctx: Context, use_bsgs: bool = True, n1: int = BSGS_N1, n2: int = BSGS_N2
) -> List[int]:
    """Galois elements the transcipher needs (reference add_gk_indices,
    ``pasta_3_seal.cpp:190-201``): rotate -1, column swap, +T when the packing
    is not full, and — for the hoisted BSGS matmul — the babystep elements
    -1..-(n1-1) and giantstep elements -n1*k."""
    elts = {ctx.galois_elt_from_step(-1), 2 * ctx.n - 1}
    if ctx.n // 2 != T:
        elts.add(ctx.galois_elt_from_step(T))
    if use_bsgs:
        for j in range(1, n1):
            elts.add(ctx.galois_elt_from_step(-j))
        for k in range(1, n2):
            elts.add(ctx.galois_elt_from_step(-k * n1))
    return sorted(elts)


class Transcipher:
    """Evaluates PASTA-3 decryption under BFV (one instance per context+keys)."""

    def __init__(
        self,
        ctx: Context,
        rk: KSwitchKey,
        gks: Dict[int, KSwitchKey],
        use_bsgs: bool = True,
        n1: int = BSGS_N1,
        n2: int = BSGS_N2,
        use_mxu_galois: Optional[bool] = None,
    ):
        assert n1 * n2 == T, (n1, n2)
        self.ctx = ctx
        self.rk = rk
        self.gks_all = gks
        self.n1, self.n2 = n1, n2
        # MXU one-hot-matmul Galois permutations (galois_mxu): replaces the
        # hot-path NTT-domain gathers — the measured bottleneck (~2.7 Gelem/s
        # serial gather vs idle MXU).  Auto: on for TPU backends at tileable
        # degrees, off on CPU (where int8 matmuls are slower than takes).
        if use_mxu_galois is None:
            env = os.environ.get("HHE_MXU_GALOIS")  # A/B override for tools
            if env is not None:
                use_mxu_galois = env.lower() not in ("0", "false", "off")
            else:
                use_mxu_galois = (
                    jax.default_backend() == "tpu" and ctx.n % (128 * 128) == 0
                )
        self.use_mxu_galois = use_mxu_galois and ctx.n % (128 * 128) == 0
        self.g_neg1 = ctx.galois_elt_from_step(-1)
        self.g_cols = 2 * ctx.n - 1
        self.g_t = ctx.galois_elt_from_step(T) if ctx.n // 2 != T else None
        self.gk_neg1 = gks[self.g_neg1]
        self.gk_cols = gks[self.g_cols]
        self.gk_t = gks[self.g_t] if self.g_t is not None else gks[self.g_neg1]
        self.use_bsgs = use_bsgs and all(
            ctx.galois_elt_from_step(-j) in gks for j in range(1, n1)
        ) and all(
            ctx.galois_elt_from_step(-k * n1) in gks for k in range(1, n2)
        )
        if self.use_bsgs:
            self._build_bsgs_keys(gks)
        half = ctx.n // 2
        mask = np.zeros(half + T, np.int64)
        mask[1:T] = 1
        mask[half + 1 : half + T] = 1
        self.feistel_mask = ctx.plain_for_mul(ctx.encode(mask))
        # bounded LRU caches: round-material tensors are ~0.5 GB per block at
        # production N, so unbounded caching OOMs the chip under fresh nonces
        self._pt_cache: collections.OrderedDict = collections.OrderedDict()
        self._pt_cache_max = 4
        # keystream cts are small ([2,k,N]); cache value pins the enc_key
        # array so its id() can't be recycled while the entry lives
        self._ks_cache: collections.OrderedDict = collections.OrderedDict()
        self._ks_cache_max = 64
        self._build_expand_consts()
        self._jit_keystream = jax.jit(self._keystream_impl)
        self._jit_keystream_seeded = jax.jit(self._keystream_seeded_impl)
        self._jit_expand = jax.jit(self._expand_round_mats)
        self._jit_finish = jax.jit(self._finish_impl)
        # all blocks of a long input evaluated in ONE program: the homomorphic
        # ops batch across blocks (the reference loops blocks sequentially,
        # ``pasta_3_seal.cpp:118``); the seeded variant expands each block's
        # round material inside the program (nothing GB-scale materializes)
        self._jit_keystream_blocks = jax.jit(
            jax.vmap(self._keystream_impl, in_axes=(None, 0, 0, None))
        )
        self._jit_keystream_blocks_seeded = jax.jit(
            jax.vmap(self._keystream_seeded_impl, in_axes=(None, 0, 0, None))
        )
        # blocks per vmapped seeded program: each in-flight block expands
        # ~4*T*(k+1)*N*4 bytes of round material inside the program
        self.max_block_batch = 4

    def _cache_put(self, cache, maxsize, key, value):
        cache[key] = value
        cache.move_to_end(key)
        while len(cache) > maxsize:
            cache.popitem(last=False)

    def clear_caches(self):
        """Free the device round-material / keystream caches (the round
        material is ~0.5 GB per block at production N)."""
        self._pt_cache.clear()
        self._ks_cache.clear()

    def _build_bsgs_keys(self, gks: Dict[int, KSwitchKey]):
        """Precompute the batched BSGS material.

        The babystep inner loop uses **permute-after-contraction**: since
        galois automorphisms act on the NTT (evaluation) domain as pure index
        permutations and the key-switch inner product is pointwise, for each
        babystep rotation sigma_j

            sum_d sigma_j(fd_d) * K_{j,d}  ==  sigma_j( sum_d fd_d * K'_{j,d} )

        with K'_{j,d} = sigma_j^{-1}(K_{j,d}) precomputed here once.  The hot
        path then gathers only the [k+1, N] contraction *results* instead of
        the [kd, k+1, N] digit tensors — ~13x less gather volume (gathers,
        not modular math, dominate on TPU).
        """
        ctx = self.ctx

        def inv_permuted(elt: int) -> Tuple[jnp.ndarray, jnp.ndarray, np.ndarray]:
            src = bfv_eval.ntt_galois_src(ctx, elt)
            inv = jnp.asarray(np.argsort(src))
            k = gks[elt]
            # moduli-major [k+1, kd, N] layout: the fused Pallas contraction
            # streams [kd, tile] blocks per modulus (kswitch_pallas)
            return (
                jnp.swapaxes(jnp.take(k.k0, inv, axis=-1), 0, 1),
                jnp.swapaxes(jnp.take(k.k1, inv, axis=-1), 0, 1),
                src,
            )

        baby = [inv_permuted(ctx.galois_elt_from_step(-j)) for j in range(1, self.n1)]
        self.baby_k0 = jnp.stack([b[0] for b in baby])  # [n1-1, k+1, kd, N]
        self.baby_k1 = jnp.stack([b[1] for b in baby])
        ident = np.arange(ctx.n)
        # row 0 = identity: used for the rot_f0 fan-out (j = 0 term included)
        self.baby_srcs = jnp.asarray(
            np.stack([ident] + [b[2] for b in baby])
        )  # [n1, N]
        giant = [
            inv_permuted(ctx.galois_elt_from_step(-k * self.n1))
            for k in range(1, self.n2)
        ]
        if giant:
            self.giant_k0 = jnp.stack([g[0] for g in giant])
            self.giant_k1 = jnp.stack([g[1] for g in giant])
            self.giant_nsrc = jnp.asarray(np.stack([g[2] for g in giant]))
            csrc, csign = [], []
            for k in range(1, self.n2):
                s, sg = ctx.galois_perm(ctx.galois_elt_from_step(-k * self.n1))
                csrc.append(s)
                csign.append(sg)
            self.giant_csrc = jnp.asarray(np.stack(csrc))
            self.giant_csign = jnp.asarray(np.stack(csign))
        else:
            self.giant_k0 = self.giant_k1 = None
            self.giant_nsrc = self.giant_csrc = self.giant_csign = None
        if self.use_mxu_galois:
            from . import galois_mxu

            # one PermSet covers the rot_f0 fan-out (row 0 = identity, g=1)
            # AND — via rows(1:) — the aligned babystep result permutes
            self.baby_ps = galois_mxu.build_perms(
                ctx, [1] + [ctx.galois_elt_from_step(-j) for j in range(1, self.n1)]
            )
            self.giant_ps = (
                galois_mxu.build_perms(
                    ctx,
                    [ctx.galois_elt_from_step(-k * self.n1) for k in range(1, self.n2)],
                )
                if self.n2 > 1
                else None
            )
        else:
            self.baby_ps = self.giant_ps = None

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
    # Device-side round-material expansion (seeded)
    #
    # The 4 rounds x 2 states x 128x128 SHAKE matrices become ~430 MB of
    # plaintext diagonals at N=16384 when precomputed on the host — per
    # block.  Instead only the SHAKE *first rows* (4x2x128 words) cross the
    # host->device boundary; the sequential matrix recurrence, diagonal
    # extraction, BSGS pre-rotation, slot encoding and NTT lifting to q ∪ P
    # all run inside the jitted keystream (reference semantics:
    # pasta_3_plain.cpp:86-110 recurrence; pasta_3_seal.cpp:278-330 packing).
    # ------------------------------------------------------------------

    def _build_expand_consts(self):
        ctx = self.ctx
        half, n = ctx.n // 2, ctx.n
        i_idx = np.arange(T)[:, None]
        j_idx = np.arange(T)[None, :]
        self._diag_sel = jnp.asarray((j_idx + T - i_idx) % T)  # [T(i), T(j)]
        roll = (i_idx // self.n1) * self.n1 if self.use_bsgs else np.zeros_like(i_idx)
        tgt0 = (j_idx - roll) % half  # slot within row 0
        self._scatter_rows = jnp.asarray(np.broadcast_to(i_idx, (T, T)))
        self._scatter_cols0 = jnp.asarray(tgt0)
        self._scatter_cols1 = jnp.asarray(tgt0 + half)
        # encoder inverse permutation: poly_br = slots[inv_map]
        inv_map = np.empty(n, np.int64)
        inv_map[ctx.encoder_map] = np.arange(n)
        self._enc_inv_map = jnp.asarray(inv_map)
        self._tb_t = ntt.build_tables((ctx.t,), n)
        # device-side add_plain scaling constants (see _finish_impl):
        # round(Q m / t) mod q_i = delta_i * m + fix, with
        # fix = floor((r m + h)/t), r = Q mod t, h = (t+1)/2.  fix is
        # recovered without 64-bit division as (r m + h - [r m + h]_t) * t^-1
        # in wrapping u32 arithmetic (the true quotient fits u32).
        from .modular import to_mont_host

        t = int(ctx.t)
        self._fin_r_mont = jnp.uint32(to_mont_host(np.uint64(int(ctx.q_mod_t) % t), t))
        self._fin_r = jnp.uint32(int(ctx.q_mod_t) % (1 << 32))
        self._fin_h = jnp.uint32((t + 1) // 2)
        self._fin_inv_t = jnp.uint32(pow(t, -1, 1 << 32))
        self._fin_delta_mont = jnp.asarray(
            np.array(
                [
                    to_mont_host(np.uint64(int(d) % int(q)), int(q))
                    for d, q in zip(ctx.delta_mod_q, ctx.q_moduli)
                ],
                np.uint32,
            ).reshape(ctx.k, 1)
        )

    def _expand_round_mats(self, first_rows: jnp.ndarray) -> jnp.ndarray:
        """first_rows u32 [8, T] (4 rounds x (mat1, mat2)) -> NTT+Mont
        plaintext diagonals over q ∪ P: [4, T, k+1, N]."""
        ctx = self.ctx
        t_q = self._tb_t.q  # [1,1]
        t_qi = self._tb_t.qinv_neg
        t_r2 = self._tb_t.r2

        first_m = mont_mul(first_rows, t_r2[0], t_q[0], t_qi[0])  # Mont domain

        def row_step(prev, _):
            # row[j] = first[j]*prev[T-1] + prev[j-1]  (mod t)
            last = prev[:, T - 1 : T]  # [8,1]
            prod = mont_mul(first_m, last, t_q[0], t_qi[0])
            shifted = jnp.concatenate(
                [jnp.zeros((8, 1), jnp.uint32), prev[:, :-1]], axis=1
            )
            row = add_mod(prod, shifted, t_q[0])
            return row, row

        _, rows = lax.scan(row_step, first_rows, None, length=T - 1)
        mats = jnp.concatenate([first_rows[None], rows], 0)  # [T(row), 8, T(col)]
        mats = jnp.transpose(mats, (1, 0, 2))  # [8, T, T]

        # diagonals: d[s, i, j] = mats[s, j, (j+T-i)%T]
        d = mats[
            jnp.arange(8)[:, None, None],
            jnp.arange(T)[None, None, :],
            self._diag_sel[None, :, :],
        ]  # [8, T(i), T(j)]
        m1 = d[0::2]  # [4, T, T] rounds' mat1 diagonals
        m2 = d[1::2]
        # scatter into slot rows with BSGS pre-rotation
        sl1 = jnp.zeros((4, T, ctx.n), jnp.uint32).at[
            :, self._scatter_rows, self._scatter_cols0
        ].set(m1)
        sl2 = jnp.zeros((4, T, ctx.n), jnp.uint32).at[
            :, self._scatter_rows, self._scatter_cols1
        ].set(m2)
        slot_vecs = add_mod(sl1, sl2, t_q[0])  # disjoint supports -> combine

        # encode: slots -> bit-reversed order -> inverse NTT mod t
        poly_br = jnp.take(slot_vecs, self._enc_inv_map, axis=-1)
        poly = ntt.ntt_inv(poly_br[..., None, :], self._tb_t)[..., 0, :]  # [4,T,N] mod t

        # lift to q ∪ P: reduce, forward NTT, to Montgomery
        pq = ctx.tb_qp.q
        lifted = rns.reduce_u32(poly[..., None, :], pq)  # [4, T, k+1, N]
        f = ntt.ntt_fwd(lifted, ctx.tb_qp)
        return ntt.to_mont(f, ctx.tb_qp)

    def block_first_rows(self, nonce: int, b: int) -> jnp.ndarray:
        """Host: the tiny SHAKE seed material [8, T] u32 for one block."""
        mats1, mats2, _, _ = pasta.block_randomness(self.ctx.t, nonce, b)
        out = np.empty((8, T), np.uint32)
        for r in range(4):
            out[2 * r] = mats1[r][0]
            out[2 * r + 1] = mats2[r][0]
        return jnp.asarray(out)

    def block_rcs(self, nonce: int, b: int) -> jnp.ndarray:
        """Host: scaled round-constant plaintexts [4, k, N] (small)."""
        ctx = self.ctx
        half = ctx.n // 2
        _, _, rcs1, rcs2 = pasta.block_randomness(ctx.t, nonce, b)
        rc_vecs = np.zeros((4, half + T), np.uint64)
        for r in range(4):
            rc_vecs[r, :T] = rcs1[r]
            rc_vecs[r, half : half + T] = rcs2[r]
        return ctx.plain_for_add_batch(ctx.encode_batch(rc_vecs))

    def _keystream_seeded_impl(self, key_data, first_rows, rcs_pt, keys):
        """Keystream with on-device round-material expansion."""
        mats_qp = self._expand_round_mats(first_rows)  # [4, T, k+1, N]
        mats_q = mats_qp[..., : self.ctx.k, :]
        st = Ciphertext(key_data)
        for r in range(4):
            m_r = (mats_q[r], mats_qp[r]) if self.use_bsgs else mats_q[r]
            st = self._matmul(st, m_r, keys)
            st = bfv_eval.add_plain(self.ctx, st, rcs_pt[r])
            st = self._mix(st, keys)
            if r < 2:
                st = self._sbox_feistel(st, keys)
            elif r == 2:
                st = bfv_eval.exponentiate(self.ctx, st, 3, keys[0])
        return st.data

    # ------------------------------------------------------------------
    # Host-precomputed per-block plaintext material
    # ------------------------------------------------------------------

    def block_plaintexts(self, nonce: int, b: int):
        """Per-(nonce, block) device plaintext material.

        Diagonal mode: (mats_pt [4, T, k, N] NTT+Mont, rcs_pt [4, k, N]).
        BSGS mode: (mats_q [4, T, k, N], mats_qp [4, T, k+1, N], rcs_pt) with
        each diagonal pre-rotated left by (i // N1) * N1 within its row
        (reference babystep_giantstep diag prep, pasta_3_seal.cpp:278-330)."""
        kcache = (nonce, b, self.use_bsgs)
        if kcache in self._pt_cache:
            return self._pt_cache[kcache]
        ctx = self.ctx
        half = ctx.n // 2
        mats1, mats2, rcs1, rcs2 = pasta.block_randomness(ctx.t, nonce, b)
        i_idx = np.arange(T)[:, None]
        j_idx = np.arange(T)[None, :]
        sel = (j_idx + T - i_idx) % T  # diag i entry j: mat[j][(j+T-i)%T]
        diag_vecs = np.zeros((4, T, ctx.n), np.uint64)
        rc_vecs = np.zeros((4, half + T), np.uint64)
        for r in range(4):
            d1 = mats1[r][j_idx, sel]  # [T(i), T(j)]
            d2 = mats2[r][j_idx, sel]
            row0 = np.zeros((T, half), np.uint64)
            row1 = np.zeros((T, half), np.uint64)
            row0[:, :T] = d1
            row1[:, :T] = d2
            if self.use_bsgs:
                for i in range(T):
                    kk = i // self.n1
                    if kk:
                        row0[i] = np.roll(row0[i], -kk * self.n1)
                        row1[i] = np.roll(row1[i], -kk * self.n1)
            diag_vecs[r, :, :half] = row0
            diag_vecs[r, :, half:] = row1
            rc_vecs[r, :T] = rcs1[r]
            rc_vecs[r, half : half + T] = rcs2[r]
        polys = ctx.encode_batch(diag_vecs.reshape(4 * T, ctx.n))
        rcs_pt = ctx.plain_for_add_batch(ctx.encode_batch(rc_vecs))
        if self.use_bsgs:
            mats_q = ctx.plain_for_mul_batch(polys).reshape(4, T, ctx.k, ctx.n)
            mats_qp = ctx.plain_for_mul_qp_batch(polys).reshape(
                4, T, ctx.k + 1, ctx.n
            )
            out = ((mats_q, mats_qp), rcs_pt)
        else:
            mats_pt = ctx.plain_for_mul_batch(polys).reshape(4, T, ctx.k, ctx.n)
            out = (mats_pt, rcs_pt)
        self._cache_put(self._pt_cache, self._pt_cache_max, kcache, out)
        return out

    # ------------------------------------------------------------------
    # Homomorphic building blocks (jit-traced)
    # ------------------------------------------------------------------

    def _keys(self):
        """Key pytree passed into the jitted keystream (NOT closed over, so
        re-keygen doesn't change the traced graph / bust the compile cache)."""
        base = (self.rk, self.gk_neg1, self.gk_t, self.gk_cols)
        if self.use_bsgs:
            return base + (
                (self.baby_k0, self.baby_k1, self.baby_srcs),
                (
                    self.giant_k0,
                    self.giant_k1,
                    self.giant_nsrc,
                    self.giant_csrc,
                    self.giant_csign,
                ),
                (self.baby_ps, self.giant_ps),  # MXU perms (None when off)
            )
        return base

    def round_mats(self, mats, r: int):
        """Slice the per-block matrix bundle for round r (mode-aware).

        Host-precomputed bundles are (mats_q, mats_qp) tuples; the device-
        expanded path caches ONE [4, T, k+1, N] tensor (half the HBM) and
        the q-part slice happens here, fused inside the jit."""
        if isinstance(mats, tuple):
            return (mats[0][r], mats[1][r]) if self.use_bsgs else mats[r]
        m = mats[r]
        if m.shape[-2] == self.ctx.k + 1:
            return (m[..., : self.ctx.k, :], m) if self.use_bsgs else m[..., : self.ctx.k, :]
        return m

    def _matmul(self, st: Ciphertext, mats, keys) -> Ciphertext:
        if self.use_bsgs:
            return self._matmul_bsgs(st, mats, keys)
        return self._matmul_diag(st, mats, keys)

    def _matmul_diag(self, st: Ciphertext, mats: jnp.ndarray, keys) -> Ciphertext:
        """Packed two-matrix diagonal product (reference diagonal,
        ``pasta_3_seal.cpp:370-413``) with the rotation loop as lax.scan."""
        ctx = self.ctx
        gk_neg1, gk_t = keys[1], keys[2]
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

    def _matmul_bsgs(self, st: Ciphertext, mats, keys) -> Ciphertext:
        """TPU-first babystep-giantstep matmul (reference babystep_giantstep,
        ``pasta_3_seal.cpp:267-366``) built around what the hardware profile
        actually shows (gathers ~3 Gelem/s are the bottleneck; u32 Montgomery
        math runs at ~70 Gelem/s):

        - **Hoisting**: the state's key-switch digit decomposition (the
          expensive NTT set) is computed ONCE per matmul.
        - **Permute-after-contraction**: babystep rotations permute the
          [k+1, N] key-contraction results, not the [kd, k+1, N] digit
          tensors (keys are inverse-permuted at setup) — ~13x less gather.
        - **Full batching**: all n1 babysteps and all n2 giantstep groups run
          as single fused tensor ops (no sequential scan), all giantstep
          hoists run as one batched NTT.
        - **Lazy mod-down**: key-switch contributions accumulate over q ∪ P
          in NTT domain; one mod-down per giantstep group and one for the
          giantstep sum.
        - **MXU permutation lowering** (``use_mxu_galois``, auto on TPU):
          the remaining NTT-domain gathers (rot_f0 fan-out, babystep /
          giantstep result permutes) run as one-hot int8 matmuls on the
          128x128 systolic array (``galois_mxu``) — bit-identical, measured
          5-8x faster than ``jnp.take`` at these shapes on TPU v5e.
        """
        ctx = self.ctx
        n1, n2 = self.n1, self.n2
        mats_q, mats_qp = mats  # [T, k, N], [T, k+1, N]
        gk_t = keys[2]
        baby_k0, baby_k1, baby_srcs = keys[4]
        giant_k0, giant_k1, giant_nsrc, giant_csrc, giant_csign = keys[5]
        baby_ps, giant_ps = keys[6] if len(keys) > 6 else (None, None)
        use_mxu = self.use_mxu_galois and baby_ps is not None
        if use_mxu:
            from . import galois_mxu
        q, qi = ctx.tb_q.q, ctx.tb_q.qinv_neg
        qp, qpi = ctx.tb_qp.q, ctx.tb_qp.qinv_neg
        take_last = lambda x, s: jnp.take(x, s, axis=-1)  # noqa: E731

        if self.g_t is not None:
            st = bfv_eval.add(ctx, st, bfv_eval.apply_galois(ctx, st, self.g_t, gk_t))

        f01 = ntt.ntt_fwd(st.data, ctx.tb_q)  # one call for both components
        f0, f1 = f01[0], f01[1]
        fd = bfv_eval.hoist_digits(ctx, st.data[1])  # [kd, k+1, N] NTT(qP)
        fd_t = jnp.swapaxes(fd, -3, -2)  # moduli-major [k+1, kd, N]

        # all n1 NTT-domain rotations of f0 at once (row 0 = identity).
        # MXU mode lowers the permutations to one-hot int8 matmuls
        # (galois_mxu) instead of serial gathers — bit-identical output.
        if use_mxu:
            rot_f0 = galois_mxu.apply_broadcast(f0, baby_ps)  # [n1, k, N]
        else:
            rot_f0 = jax.vmap(take_last, (None, 0))(f0, baby_srcs)  # [n1, k, N]

        # babystep key contractions in the unpermuted frame (keys stored
        # moduli-major [J, k+1, kd, N]).  Measured on TPU v5e: this XLA
        # multiply-accumulate runs at ~680 GB/s of key traffic — HBM peak —
        # so a fused Pallas variant cannot beat it (a VMEM-resident kernel
        # was built and measured 6x SLOWER: the VPU has no native u32
        # widening multiply, so the 16-bit-digit Montgomery math is
        # compute-bound in-kernel while XLA's fusion is bandwidth-bound).
        def contract(fdig_t, k0s, k1s):
            t0 = mont_mul(fdig_t[..., 0, :], k0s[..., 0, :], qp, qpi)
            t1 = mont_mul(fdig_t[..., 0, :], k1s[..., 0, :], qp, qpi)
            for d in range(1, ctx.k):
                t0 = add_mod(
                    t0, mont_mul(fdig_t[..., d, :], k0s[..., d, :], qp, qpi), qp
                )
                t1 = add_mod(
                    t1, mont_mul(fdig_t[..., d, :], k1s[..., d, :], qp, qpi), qp
                )
            return t0, t1

        b0, b1 = contract(fd_t, baby_k0, baby_k1)  # [n1-1, k+1, N]
        if use_mxu:
            baby_tail = baby_ps.rows(slice(1, None))
            h0 = galois_mxu.apply_aligned(b0, baby_tail)
            h1 = galois_mxu.apply_aligned(b1, baby_tail)
        else:
            h0 = jax.vmap(take_last)(b0, baby_srcs[1:])
            h1 = jax.vmap(take_last)(b1, baby_srcs[1:])

        dq = mats_q.reshape(n2, n1, ctx.k, ctx.n)
        dqp = mats_qp.reshape(n2, n1, ctx.k + 1, ctx.n)

        # q-part: acc0q[g] = sum_j rot_f0[j] * Dq[g, j]; raw c1 only at j = 0.
        # One batched [n2, n1, k, N] multiply + log-depth tree reduction: a
        # sequential j-loop of fused mul+adds was the measured hot spot
        # (10.2 ms of the ~27 ms matmul, tools/profile_matmul.py round 4) —
        # n1 serially-dependent kernel launches vs one bandwidth-bound pass.
        from .modular import tree_add_mod

        acc0q = tree_add_mod(
            mont_mul(rot_f0[None], dq, q, qi), q, axis=1
        )[:, 0]
        acc1q = mont_mul(f1[None], dq[:, 0], q, qi)

        # P-part: acc*p[g] = sum_{j>=1} H*[j] * Dqp[g, j], lazily over q ∪ P
        acc0p = tree_add_mod(
            mont_mul(h0[None], dqp[:, 1:], qp, qpi), qp, axis=1
        )[:, 0]
        acc1p = tree_add_mod(
            mont_mul(h1[None], dqp[:, 1:], qp, qpi), qp, axis=1
        )[:, 0]

        # batch the four accumulator inverse-NTTs into two calls (q and qP
        # bases) — per-call NTT cost is throughput-bound, but fewer launches
        # fragment the graph less and keep the kernel fed
        iq = ntt.ntt_inv(jnp.stack([acc0q, acc1q]), ctx.tb_q)  # [2, n2, k, N]
        ip = bfv_eval.mod_down(
            ctx, ntt.ntt_inv(jnp.stack([acc0p, acc1p]), ctx.tb_qp)
        )
        i0 = add_mod(iq[0], ip[0], q)  # [n2, k, N]
        i1 = add_mod(iq[1], ip[1], q)
        if n2 == 1:
            return Ciphertext(jnp.stack([i0[0], i1[0]]))

        # giantsteps: out = inner_0 + sum_g sigma_{-g*n1}(inner_g)
        p0 = jax.vmap(take_last)(i0[1:], giant_csrc)
        p0 = jnp.where(giant_csign[:, None, :], neg_mod(p0, q), p0)
        out0 = i0[0]
        for g in range(n2 - 1):
            out0 = add_mod(out0, p0[g], q)

        fdg = bfv_eval.hoist_digits(ctx, i1[1:])  # [n2-1, kd, k+1, N]
        g0, g1 = contract(
            jnp.swapaxes(fdg, -3, -2), giant_k0, giant_k1
        )  # [n2-1, k+1, N]
        if use_mxu and giant_ps is not None:
            hg0 = galois_mxu.apply_aligned(g0, giant_ps)
            hg1 = galois_mxu.apply_aligned(g1, giant_ps)
        else:
            hg0 = jax.vmap(take_last)(g0, giant_nsrc)
            hg1 = jax.vmap(take_last)(g1, giant_nsrc)
        accp0, accp1 = hg0[0], hg1[0]
        for g in range(1, n2 - 1):
            accp0 = add_mod(accp0, hg0[g], qp)
            accp1 = add_mod(accp1, hg1[g], qp)
        out0 = add_mod(out0, bfv_eval.mod_down(ctx, ntt.ntt_inv(accp0, ctx.tb_qp)), q)
        out1 = add_mod(i1[0], bfv_eval.mod_down(ctx, ntt.ntt_inv(accp1, ctx.tb_qp)), q)
        return Ciphertext(jnp.stack([out0, out1]))

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

    def _finish_impl(self, ks_data, chunk) -> jnp.ndarray:
        """Negate keystream + add the symmetric-ciphertext chunk, entirely on
        device (reference ``pasta_3_seal.cpp:161-169``: negate + add_plain).

        Encodes the chunk on device (slot scatter -> inverse NTT mod t) and
        applies the BFV plain-add scaling round(Q m / t) mod q_i =
        delta_i m + fix without 64-bit division: the true quotient
        fix = floor((r m + h)/t) fits u32, so it is exactly
        (r m + h - [r m + h]_t) * t^{-1} in wrapping u32 arithmetic.

        ks_data [2, k, N]; chunk u32 [B, L<=T]; returns [2, B, k, N]."""
        ctx = self.ctx
        B = chunk.shape[0]
        q, qi = ctx.tb_q.q, ctx.tb_q.qinv_neg
        t_q, t_qi = self._tb_t.q[0], self._tb_t.qinv_neg[0]
        slots = jnp.zeros((B, ctx.n), jnp.uint32).at[:, : chunk.shape[1]].set(chunk)
        poly_br = jnp.take(slots, self._enc_inv_map, axis=-1)
        m = ntt.ntt_inv(poly_br[..., None, :], self._tb_t)[..., 0, :]  # [B, N] mod t
        rm_mod = mont_mul(m, self._fin_r_mont, t_q, t_qi)
        rem = add_mod(rm_mod, self._fin_h, t_q)
        x_lo = self._fin_r * m + self._fin_h  # wrapping u32
        fix = (x_lo - rem) * self._fin_inv_t  # wrapping u32, exact quotient
        dm = mont_mul(m[..., None, :], self._fin_delta_mont, q, qi)  # [B, k, N]
        fixb = fix[..., None, :]
        fixr = jnp.where(fixb >= q, fixb - q, fixb)
        scaled = add_mod(dm, fixr, q)
        c0 = add_mod(neg_mod(ks_data[0], q)[None], scaled, q)
        c1 = jnp.broadcast_to(neg_mod(ks_data[1], q)[None], c0.shape)
        return jnp.stack([c0, c1])

    def _keystream_impl(self, key_data, mats_pt, rcs_pt, keys) -> jnp.ndarray:
        """Full 3-round PASTA keystream evaluation on the encrypted key."""
        ctx = self.ctx
        st = Ciphertext(key_data)
        for r in range(4):
            st = self._matmul(st, self.round_mats(mats_pt, r), keys)
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

    def keystream_ct(
        self,
        enc_key: Ciphertext,
        nonce: int,
        b: int,
        expand_on_device: bool = True,
    ) -> Ciphertext:
        """BFV ciphertext of the PASTA keystream for block b (cached).

        With expand_on_device (default) only ~4 KB of SHAKE seed material
        crosses the host->device boundary; the plaintext diagonals are
        expanded inside the jitted keystream."""
        ck = (id(enc_key.data), nonce, b)
        if ck not in self._ks_cache:
            mats_pt, rcs_pt = self.device_block_plaintexts(nonce, b, expand_on_device)
            out = self._jit_keystream(enc_key.data, mats_pt, rcs_pt, self._keys())
            self._cache_put(
                self._ks_cache, self._ks_cache_max, ck, (enc_key.data, Ciphertext(out))
            )
        return self._ks_cache[ck][1]

    def device_block_plaintexts(
        self, nonce: int, b: int, expand_on_device: bool = True
    ):
        """Per-block plaintext material as device arrays, cached on device.

        Seeded mode expands the diagonals on device (cached — the expansion
        cost amortizes across all samples sharing the block)."""
        if not expand_on_device:
            return self.block_plaintexts(nonce, b)
        ck = ("dev", nonce, b)
        if ck not in self._pt_cache:
            mats_qp = self._jit_expand(self.block_first_rows(nonce, b))
            self._cache_put(
                self._pt_cache,
                self._pt_cache_max,
                ck,
                (mats_qp, self.block_rcs(nonce, b)),
            )
        return self._pt_cache[ck]

    def keystream_blocks(
        self, enc_key: Ciphertext, nonce: int, blocks: List[int]
    ) -> List[Ciphertext]:
        """Keystream ciphertexts for several blocks in ONE batched program
        (the homomorphic ops vectorize across the block axis; cached).

        Uses the seeded path: each block's round material is expanded from
        its ~4 KB SHAKE seed INSIDE the program, so no [4,T,k+1,N] tensors
        (~0.5 GB each at production N) ever materialize in HBM between
        calls. Blocks run in chunks of max_block_batch to bound the in-
        program expansion footprint."""
        missing = [
            b for b in blocks if (id(enc_key.data), nonce, b) not in self._ks_cache
        ]
        if len(missing) >= 2:
            for s in range(0, len(missing), self.max_block_batch):
                group = missing[s : s + self.max_block_batch]
                if len(group) == 1:
                    self.keystream_ct(enc_key, nonce, group[0])
                    continue
                first = jnp.stack([self.block_first_rows(nonce, b) for b in group])
                rcs = jnp.stack([self.block_rcs(nonce, b) for b in group])
                outs = self._jit_keystream_blocks_seeded(
                    enc_key.data, first, rcs, self._keys()
                )
                for i, b in enumerate(group):
                    self._cache_put(
                        self._ks_cache,
                        self._ks_cache_max,
                        (id(enc_key.data), nonce, b),
                        (enc_key.data, Ciphertext(outs[i])),
                    )
        return [self.keystream_ct(enc_key, nonce, b) for b in blocks]

    def keystream_round_budgets(
        self, enc_key: Ciphertext, sk, nonce: int = pasta.NONCE, b: int = 0
    ) -> List[int]:
        """Noise budget (bits) after each of the 4 keystream rounds — the
        reference's per-round debug telemetry (``pasta_3_seal.cpp:73``,
        print_noise inside HE_decrypt's round loop). Runs the round ops
        eagerly so intermediates are observable; bit-identical math to the
        jitted path."""
        ctx = self.ctx
        mats_pt, rcs_pt = self.device_block_plaintexts(nonce, b)
        keys = self._keys()
        st = Ciphertext(enc_key.data)
        budgets = []
        for r in range(4):
            st = self._matmul(st, self.round_mats(mats_pt, r), keys)
            st = bfv_eval.add_plain(ctx, st, rcs_pt[r])
            st = self._mix(st, keys)
            if r < 2:
                st = self._sbox_feistel(st, keys)
            elif r == 2:
                st = bfv_eval.exponentiate(ctx, st, 3, keys[0])
            budgets.append(ctx.noise_budget(sk, st))
        return budgets

    def decompose(
        self, enc_key: Ciphertext, sym_ct, nonce: int = pasta.NONCE, mesh=None
    ) -> List[Ciphertext]:
        """PASTA ciphertexts -> BFV ciphertexts (reference decomposition).

        sym_ct: [L] or [B, L] u64.  Returns one ciphertext per 128-block; for
        batched input each has data shape [2, B, k, N].

        With ``mesh`` (axes ("batch", "limb")) the per-sample finish runs
        with the sample batch sharded over the mesh's batch axis — the
        reference's sequential per-record loop (``CSP.cpp:247-252``)
        parallelized across chips.  Shard ``enc_key`` over the limb axis to
        also distribute the keystream evaluation."""
        sym = np.asarray(sym_ct, np.uint64)
        batched = sym.ndim == 2
        sym2 = np.atleast_2d(sym)
        B, L = sym2.shape
        nblocks = math.ceil(L / T)
        kss = self.keystream_blocks(enc_key, nonce, list(range(nblocks)))
        out = []
        for b in range(nblocks):
            ks = kss[b]
            chunk = jnp.asarray(
                sym2[:, b * T : min((b + 1) * T, L)].astype(np.uint32)
            )  # tiny host->device transfer; encode + scale run on device
            if mesh is not None:
                from jax.sharding import NamedSharding, PartitionSpec as P

                chunk = jax.device_put(chunk, NamedSharding(mesh, P("batch", None)))
            res = self._jit_finish(ks.data, chunk)  # [2, B, k, N]
            if batched:
                out.append(Ciphertext(res))
            else:
                out.append(Ciphertext(res[:, 0]))
        return out
