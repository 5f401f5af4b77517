"""BFV (RNS) context, keys, encoder, encryption and decryption.

TPU-native re-design of SEAL 4.0's BFV stack (reference
``libs/seal/include/SEAL-4.0/seal/{context,keygenerator,encryptor,decryptor,
batchencoder}.h``):

- Ciphertexts are u32 RNS tensors of shape ``[size, k, N]`` in **coefficient
  domain** (SEAL's BFV convention); keys are stored in **NTT + Montgomery**
  domain so hot-path pointwise products need no conversion.
- The coefficient modulus is a chain of <2^31 NTT-friendly primes (see
  ``hhe_tpu.ops.primes``) so all limb arithmetic fits 32-bit TPU lanes; one
  extra 31-bit "special" prime backs hybrid key-switching, auxiliary bases
  back the BEHZ ct x ct multiply (``hhe_tpu.ops.bfv_eval``).
- Keygen / encrypt / decrypt run host-side (numpy u64 exact) — these are the
  light party-side operations (Analyst/User); the Evaluator (CSP hot path) is
  device-side jnp (``bfv_eval``).
- The batch encoder reproduces SEAL's 2 x (N/2) row/column slot structure
  (``seal/batchencoder.h``) so ``rotate_rows``/``rotate_columns`` semantics
  match the reference exactly.
"""

from __future__ import annotations

import dataclasses
import functools
import math
from typing import Dict, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from . import modular, ntt, primes, rns


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------


@dataclasses.dataclass(frozen=True)
class BFVParams:
    """HE parameters (reference ``configs/config.cpp:15-26``: t=65537, N=16384,
    tc128 -> SEAL BFVDefault 438-bit chain; here 13x30-bit data primes ~390
    usable bits, plus one 31-bit special prime — the same noise budget class)."""

    n: int = 16384
    t: int = 65537
    data_limb_bits: int = 30
    data_limbs: int = 13
    seed: int = 0

    def __post_init__(self):
        assert self.n & (self.n - 1) == 0
        assert (self.t - 1) % (2 * self.n) == 0, "t must be NTT-friendly for batching"


class Ciphertext(NamedTuple):
    """BFV ciphertext: u32 ``[size, k, N]`` coefficient-domain RNS tensor."""

    data: jnp.ndarray

    @property
    def size(self) -> int:
        return self.data.shape[0]


class Plaintext(NamedTuple):
    """Plaintext polynomial mod t: u64 ``[N]`` coefficient domain (t may be
    up to ~60 bits on the host — device paths only ever see residues mod the
    <2^31 coefficient primes)."""

    data: np.ndarray


class SecretKey(NamedTuple):
    s_small: np.ndarray  # [N] int8 ternary coefficients
    s_q: np.ndarray  # [k, N] u32 coeff domain (mod each data prime)


class PublicKey(NamedTuple):
    data: np.ndarray  # [2, k, N] u32 coeff domain


class KSwitchKey(NamedTuple):
    """Key-switch key: digits over data primes, each encrypting
    P * u_j * target over base q ∪ {P} (hybrid key-switching).
    Stored NTT + Montgomery for direct pointwise use."""

    k0: jnp.ndarray  # [kd, k+1, N] u32 NTT Mont
    k1: jnp.ndarray  # [kd, k+1, N] u32 NTT Mont


# ---------------------------------------------------------------------------
# Context
# ---------------------------------------------------------------------------


class Context:
    """All precomputed material for one parameter set.

    Replaces SEAL's ``SEALContext`` + ``RNSTool`` + ``NTTTables`` bundles.
    """

    def __init__(self, params: BFVParams = BFVParams()):
        p = params
        self.params = p
        self.n, self.t = p.n, p.t
        # --- prime selection (all distinct, all == 1 mod 2N) ---
        # `t` may itself be a 31-bit NTT prime (e.g. 2147352577 for the
        # overflow-free 2FC pipeline) — exclude it from every prime pool.
        tskip = (p.t,)
        # The special prime takes the LARGEST prime at the data-limb width
        # (p >= every q_i, SEAL's convention) rather than a 31-bit one: with
        # every modulus of q ∪ P below 2^30 the hot key-switch NTTs run the
        # Harvey lazy-reduction Pallas kernels (ntt_pallas: 56 vs 47 G
        # butterflies/s measured).  Costs ~1 bit of key-switch noise vs a
        # 31-bit P — well inside the chain's margins (tested).
        sp = primes.ntt_primes(p.n, p.data_limb_bits, 1, skip=tskip)
        self.p_special = sp[0]
        self.q_moduli = primes.ntt_primes(
            p.n, p.data_limb_bits, p.data_limbs, skip=tskip + sp
        )
        aux_count = p.data_limbs + 1
        b_moduli = primes.ntt_primes(p.n, 31, aux_count + 2, skip=sp + tskip)
        self.b_moduli = b_moduli[:aux_count]
        self.m_sk = b_moduli[aux_count]
        self.gamma = b_moduli[aux_count + 1]
        self.m_tilde_bits = 16
        self.m_tilde = 1 << self.m_tilde_bits

        self.base_q = rns.RnsBase(self.q_moduli)
        self.base_qp = rns.RnsBase(self.q_moduli + (self.p_special,))
        self.base_bsk = rns.RnsBase(self.b_moduli + (self.m_sk,))
        self.base_b = rns.RnsBase(self.b_moduli)
        self.k = self.base_q.k
        self.Q = self.base_q.Q

        # sanity: BEHZ capacity — |tensor product| * t < prod(Bsk)/2
        bound = self.n * self.Q * self.Q * self.t
        assert self.base_bsk.Q * self.Q > 2 * bound, "aux base too small"

        # --- NTT tables (device) and host tables ---
        self.tb_q = ntt.build_tables(self.q_moduli, p.n)
        self.tb_qp = ntt.build_tables(self.base_qp.moduli, p.n)
        self.tb_bsk = ntt.build_tables(self.base_bsk.moduli, p.n)
        self.tb_t_host = ntt.build_host_tables(self.t, p.n)

        # --- encryption scaling: round(Q*m/t) = delta_i*m + fix(m) ---
        self.delta_mod_q = np.array(
            [(self.Q // self.t) % q for q in self.q_moduli], np.uint64
        )
        self.q_mod_t = self.Q % self.t

        # --- key-switch constants ---
        pq = self.base_qp.moduli
        self.p_mod_q = np.array([self.p_special % q for q in self.q_moduli], np.uint64)
        self.p_inv_mont = jnp.asarray(
            np.array(
                [
                    modular.to_mont_host(
                        np.uint64(pow(self.p_special, -1, q)), q
                    )
                    for q in self.q_moduli
                ],
                np.uint32,
            ).reshape(self.k, 1)
        )
        self.p_half = self.p_special // 2
        # unit_j mod each modulus of q ∪ P (for key generation, host)
        self.unit_mod_qp = np.array(
            [[u % m for m in pq] for u in self.base_q.unit], dtype=np.uint64
        )  # [kd, k+1]

        # --- galois / rotation caches ---
        self._galois_perm_cache: Dict[int, Tuple[np.ndarray, np.ndarray]] = {}

        # --- batch encoder index map (SEAL seal/batchencoder.h semantics) ---
        self._build_encoder_map()

        # --- evaluator (device) constant bundle, built lazily ---
        self._eval_consts = None

        self.rng = np.random.default_rng(p.seed)

    # ------------------------------------------------------------------
    # Batch encoder
    # ------------------------------------------------------------------

    def _build_encoder_map(self):
        n, m = self.n, 2 * self.n
        logn = n.bit_length() - 1
        rev = ntt.bit_reverse_indices(n)
        idx_map = np.empty(n, np.int64)
        pos = 1
        for i in range(n // 2):
            idx_map[i] = rev[(pos - 1) >> 1]
            idx_map[i + n // 2] = rev[(m - pos - 1) >> 1]
            pos = pos * 3 % m
        self.encoder_map = idx_map

    def encode(self, values) -> Plaintext:
        """Slot values (len <= N, ints mod t; negatives allowed) -> plaintext."""
        v = np.asarray(values, np.int64) % self.t
        assert v.ndim == 1 and len(v) <= self.n
        slots = np.zeros(self.n, np.uint64)
        slots[self.encoder_map[: len(v)]] = v.astype(np.uint64)
        poly = ntt.ntt_inv_host(slots, self.tb_t_host)
        return Plaintext(poly.astype(np.uint64))

    def encode_batch(self, values: np.ndarray) -> np.ndarray:
        """[B, L<=N] slot values -> [B, N] plaintext polys (vectorized host NTT)."""
        v = np.asarray(values, np.int64) % self.t
        b, l = v.shape
        slots = np.zeros((b, self.n), np.uint64)
        slots[:, self.encoder_map[:l]] = v.astype(np.uint64)
        return ntt.ntt_inv_host(slots, self.tb_t_host).astype(np.uint64)

    def decode(self, pt: Plaintext) -> np.ndarray:
        slots = ntt.ntt_fwd_host(np.asarray(pt.data, np.uint64), self.tb_t_host)
        return slots[self.encoder_map].astype(np.uint64)

    def decode_signed(self, pt: Plaintext) -> np.ndarray:
        v = self.decode(pt).astype(np.int64)
        return np.where(v > self.t // 2, v - self.t, v)

    # ------------------------------------------------------------------
    # Sampling (host)
    # ------------------------------------------------------------------

    def _sample_ternary(self) -> np.ndarray:
        return self.rng.integers(-1, 2, self.n, dtype=np.int64)

    def _sample_cbd(self) -> np.ndarray:
        """Centered binomial, sigma = sqrt(20/2) ~ 3.16 (SEAL sigma 3.2)."""
        b = self.rng.integers(0, 2, (2, 20, self.n), dtype=np.int64)
        return b[0].sum(0) - b[1].sum(0)

    def _sample_uniform(self, moduli: Sequence[int]) -> np.ndarray:
        return np.stack(
            [self.rng.integers(0, q, self.n, dtype=np.int64) for q in moduli]
        ).astype(np.uint64)

    @staticmethod
    def _small_to_rns(x: np.ndarray, moduli: Sequence[int]) -> np.ndarray:
        """Signed small coefficients -> u64 [k, N] RNS."""
        x = np.asarray(x, np.int64)
        return np.stack([np.asarray(x % q, np.uint64) for q in moduli])

    # ------------------------------------------------------------------
    # Keygen (host; reference seal/keygenerator.h)
    # ------------------------------------------------------------------

    def keygen_secret(self) -> SecretKey:
        s = self._sample_ternary()
        return SecretKey(s.astype(np.int8), self._small_to_rns(s, self.q_moduli).astype(np.uint32))

    def keygen_public(self, sk: SecretKey, mesh=None) -> PublicKey:
        """pk = (-(a s + e), a) over base q, coefficient domain.

        With ``mesh`` (a jax Mesh with a "poly" axis) the a*s products run
        through the sharded four-step NTT (``parallel.ntt_shard``) with the
        polynomial coefficient axis split across devices — the intended
        backend for the reference's 65536 large preset
        (``SEAL_Cipher.cpp:47-61``) where a single polynomial's transforms
        dominate.  Bit-identical to the host path."""
        a = self._sample_uniform(self.q_moduli)
        e = self._sample_cbd()
        s_rns = self._small_to_rns(sk.s_small, self.q_moduli)
        e_rns = self._small_to_rns(e, self.q_moduli)
        pk0 = np.empty_like(a)
        if mesh is not None:
            from ..parallel import ntt_shard

            sn = ntt_shard.ShardedNtt(self.q_moduli, self.n, mesh)
            as_all = np.asarray(
                sn.negacyclic_mul(a.astype(np.uint32), s_rns.astype(np.uint32)),
                np.uint64,
            )
            for i, q in enumerate(self.q_moduli):
                pk0[i] = (q - (as_all[i] + e_rns[i]) % q) % q
            return PublicKey(np.stack([pk0, a]).astype(np.uint32))
        for i, q in enumerate(self.q_moduli):
            as_ = ntt.poly_mul_host(a[i], s_rns[i], q)
            pk0[i] = (q - (as_ + e_rns[i]) % q) % q
        return PublicKey(np.stack([pk0, a]).astype(np.uint32))

    def _keyswitch_gen(self, sk: SecretKey, target_rns_qp: np.ndarray) -> KSwitchKey:
        """KSK for target poly (u64 [k+1, N], coeff, mod q ∪ P):
        key_j = (-(a_j s + e_j) + P * unit_j * target, a_j) over q ∪ P."""
        pq = self.base_qp.moduli
        kd = self.k
        s_rns = self._small_to_rns(sk.s_small, pq)
        a = np.stack([self._sample_uniform(pq) for _ in range(kd)])  # [kd, k+1, N]
        e = np.stack(
            [self._small_to_rns(self._sample_cbd(), pq) for _ in range(kd)]
        )
        k0 = np.zeros((kd, len(pq), self.n), np.uint64)
        for i, m in enumerate(pq):
            mm = np.uint64(m)
            tb = ntt.build_host_tables(m, self.n)
            fa = ntt.ntt_fwd_host(a[:, i], tb)  # batched over digits
            fs = ntt.ntt_fwd_host(s_rns[i], tb)
            as_ = ntt.ntt_inv_host(fa * fs % mm, tb)
            body = (mm - (as_ + e[:, i]) % mm) % mm
            if i < kd:  # P*unit_j mod P == 0; only data limbs get payload
                factor = (
                    (self.p_special % m) * self.unit_mod_qp[:, i] % m
                )  # [kd]
                body = (body + target_rns_qp[i][None, :] * factor[:, None]) % mm
            k0[:, i] = body

        # store NTT + Montgomery domain (device)
        def to_dev(x):
            out = np.empty_like(x)
            for i, m in enumerate(pq):
                tb = ntt.build_host_tables(m, self.n)
                f = ntt.ntt_fwd_host(x[:, i], tb)
                out[:, i] = (f << np.uint64(32)) % np.uint64(m)
            return jnp.asarray(out.astype(np.uint32))

        return KSwitchKey(to_dev(k0), to_dev(a))

    def keygen_relin(self, sk: SecretKey) -> KSwitchKey:
        """Relinearization key: target = s^2 (reference create_relin_keys)."""
        pq = self.base_qp.moduli
        s_rns = self._small_to_rns(sk.s_small, pq)
        s2 = np.stack(
            [ntt.poly_mul_host(s_rns[i], s_rns[i], m) for i, m in enumerate(pq)]
        )
        return self._keyswitch_gen(sk, s2)

    def keygen_galois(self, sk: SecretKey, elts: Sequence[int]) -> Dict[int, KSwitchKey]:
        """Galois keys: target = s(X^g) (reference create_galois_keys(indices))."""
        pq = self.base_qp.moduli
        out = {}
        s_rns = self._small_to_rns(sk.s_small, pq)
        for g in elts:
            src, sign = self.galois_perm(int(g))
            sg = np.empty((len(pq), self.n), np.uint64)
            for i, m in enumerate(pq):
                v = s_rns[i][src]
                sg[i] = np.where(sign, (m - v) % m, v)
            out[int(g)] = self._keyswitch_gen(sk, sg)
        return out

    # ------------------------------------------------------------------
    # Device-side evaluation-key generation
    #
    # Generating relin+galois keys on the host means shipping ~50 MB per key
    # to the device (1+ GB for a BSGS transcipher key set).  Instead the
    # uniform/CBD randomness comes from the device PRNG and the polynomial
    # algebra runs as device NTTs; nothing large crosses the host boundary.
    # ------------------------------------------------------------------

    def keygen_eval_keys_device(
        self,
        sk: SecretKey,
        galois_elts: Sequence[int] = (),
        include_relin: bool = True,
        seed: int = 0,
    ):
        """Returns (relin_key | None, {elt: galois_key}) generated on device."""
        import jax

        from . import bfv_eval as _be  # ntt_galois_src (no circular import at call time)

        pq_mods = self.base_qp.moduli
        kp = len(pq_mods)
        kd = self.k
        n = self.n
        tb = self.tb_qp
        s_rns = jnp.asarray(
            self._small_to_rns(sk.s_small, pq_mods).astype(np.uint32)
        )
        fs = ntt.ntt_fwd(s_rns, tb)  # [k+1, N] std domain
        fs_mont = ntt.to_mont(fs, tb)

        targets = []
        labels = []
        if include_relin:
            targets.append(modular.mont_mul(fs, fs_mont, tb.q, tb.qinv_neg))
            labels.append("relin")
        for g in galois_elts:
            src = jnp.asarray(_be.ntt_galois_src(self, int(g)))
            targets.append(jnp.take(fs, src, axis=-1))
            labels.append(int(g))
        if not targets:
            return None, {}
        tf = jnp.stack(targets)  # [Tg, k+1, N] NTT std

        # P * unit_j mod m, Montgomery form: [kd, k+1, 1]
        factor = np.zeros((kd, kp, 1), np.uint32)
        for j in range(kd):
            for i, m in enumerate(pq_mods):
                v = (self.p_special % m) * int(self.unit_mod_qp[j, i]) % m
                factor[j, i, 0] = modular.to_mont_host(np.uint64(v), m)
        factor = jnp.asarray(factor)

        key = jax.random.PRNGKey(seed ^ 0x5EED)
        k_a, k_e1, k_e2 = jax.random.split(key, 3)
        tg = len(targets)

        @jax.jit
        def gen(tf, fs_mont, factor):
            # uniform a per modulus
            a_cols = []
            for i, m in enumerate(pq_mods):
                a_cols.append(
                    jax.random.randint(
                        jax.random.fold_in(k_a, i), (tg, kd, 1, n), 0, int(m),
                        dtype=jnp.uint32,
                    )
                )
            a = jnp.concatenate(a_cols, axis=2)  # [Tg, kd, k+1, N]
            # CBD(20) error via popcounts of 20-bit masks
            r1 = jax.random.bits(k_e1, (tg, kd, n), jnp.uint32) & jnp.uint32(0xFFFFF)
            r2 = jax.random.bits(k_e2, (tg, kd, n), jnp.uint32) & jnp.uint32(0xFFFFF)
            e = jax.lax.population_count(r1).astype(jnp.int32) - jax.lax.population_count(
                r2
            ).astype(jnp.int32)  # [Tg, kd, N] in [-20, 20]
            qcol = tb.q.reshape(1, 1, kp, 1).astype(jnp.int32)
            e_rns = jnp.where(
                e[:, :, None, :] < 0, e[:, :, None, :] + qcol, e[:, :, None, :]
            ).astype(jnp.uint32)
            fa = ntt.ntt_fwd(a, tb)
            fe = ntt.ntt_fwd(e_rns, tb)
            as_f = modular.mont_mul(fa, fs_mont, tb.q, tb.qinv_neg)
            payload = modular.mont_mul(tf[:, None], factor, tb.q, tb.qinv_neg)
            k0 = modular.sub_mod(
                payload, modular.add_mod(as_f, fe, tb.q), tb.q
            )
            return ntt.to_mont(k0, tb), ntt.to_mont(fa, tb)

        k0_all, k1_all = gen(tf, fs_mont, factor)
        out_rk = None
        gks = {}
        for idx, lab in enumerate(labels):
            ksk = KSwitchKey(k0_all[idx], k1_all[idx])
            if lab == "relin":
                out_rk = ksk
            else:
                gks[lab] = ksk
        return out_rk, gks

    # ------------------------------------------------------------------
    # Galois utilities
    # ------------------------------------------------------------------

    def galois_perm(self, g: int) -> Tuple[np.ndarray, np.ndarray]:
        """Coefficient permutation of x(X) -> x(X^g): returns (src, negate)
        with out[j] = ± x[src[j]]."""
        if g in self._galois_perm_cache:
            return self._galois_perm_cache[g]
        n, m = self.n, 2 * self.n
        assert g % 2 == 1
        src = np.empty(n, np.int64)
        sign = np.empty(n, bool)
        for i in range(n):
            j = i * g % m
            if j < n:
                src[j] = i
                sign[j] = False
            else:
                src[j - n] = i
                sign[j - n] = True
        self._galois_perm_cache[g] = (src, sign)
        return src, sign

    def galois_elt_from_step(self, step: int) -> int:
        """SEAL convention (seal/util/galois.h): step 0 -> column swap (elt
        2N-1); else row rotation by `step` slots (left for positive)."""
        n, m = self.n, 2 * self.n
        if step == 0:
            return m - 1
        return pow(3, step % (n // 2), m)

    # ------------------------------------------------------------------
    # Encryption / decryption (host)
    # ------------------------------------------------------------------

    def scale_plain(self, pt: Plaintext) -> np.ndarray:
        """round(Q * m / t) in RNS: u64 [k, N] (SEAL's
        multiply_add_plain_with_scaling_variant).  Exact-bigint path when
        q_mod_t * m can exceed u64 (large plaintext moduli)."""
        if self.t >= (1 << 32):
            m = np.asarray(pt.data, object)
            prod = int(self.q_mod_t) * m
            fix = (prod + (self.t + 1) // 2) // self.t
        else:
            m = np.asarray(pt.data, np.uint64)
            prod = (self.q_mod_t * m).astype(np.uint64)
            fix = (prod + np.uint64((self.t + 1) // 2)) // np.uint64(self.t)
        out = np.empty((self.k, self.n), np.uint64)
        for i, q in enumerate(self.q_moduli):
            out[i] = ((self.delta_mod_q[i] * (m % q) + fix) % q).astype(np.uint64)
        return out

    def encrypt(self, pk: PublicKey, pt: Plaintext) -> Ciphertext:
        """c = (pk0*u + e0 + round(Q m / t), pk1*u + e1)."""
        u = self._small_to_rns(self._sample_ternary(), self.q_moduli)
        e0 = self._small_to_rns(self._sample_cbd(), self.q_moduli)
        e1 = self._small_to_rns(self._sample_cbd(), self.q_moduli)
        pkd = np.asarray(pk.data, np.uint64)
        dm = self.scale_plain(pt)
        c = np.empty((2, self.k, self.n), np.uint64)
        for i, q in enumerate(self.q_moduli):
            c[0, i] = (ntt.poly_mul_host(pkd[0, i], u[i], q) + e0[i] + dm[i]) % q
            c[1, i] = (ntt.poly_mul_host(pkd[1, i], u[i], q) + e1[i]) % q
        return Ciphertext(jnp.asarray(c.astype(np.uint32)))

    def _base_for(self, kc: int) -> "rns.RnsBase":
        """RNS base of the first kc data limbs (full base when kc == k);
        supports decrypting mod-switched ciphertexts at lower levels."""
        if kc == self.k:
            return self.base_q
        if not hasattr(self, "_level_bases"):
            self._level_bases: Dict[int, rns.RnsBase] = {}
        if kc not in self._level_bases:
            self._level_bases[kc] = rns.RnsBase(self.q_moduli[:kc])
        return self._level_bases[kc]

    def _dot_with_sk(self, sk: SecretKey, ct: Ciphertext) -> np.ndarray:
        """[c0 + c1 s + c2 s^2 + ...]_q, u64 [kc, N] coeff domain (host)."""
        c = np.asarray(ct.data, np.uint64)
        size = c.shape[0]
        s_rns = np.asarray(sk.s_q, np.uint64)
        acc = c[0].copy()
        for i in range(c.shape[1]):
            q = self.q_moduli[i]
            spow = s_rns[i]
            for d in range(1, size):
                acc[i] = (acc[i] + ntt.poly_mul_host(c[d, i], spow, q)) % q
                if d + 1 < size:
                    spow = ntt.poly_mul_host(spow, s_rns[i], q)
        return acc

    def decrypt(self, sk: SecretKey, ct: Ciphertext) -> Plaintext:
        """m = [round(t/Q * [c(s)]_Q)]_t — exact host CRT scale-and-round
        (SEAL decryptor.h / RNSTool::decrypt_scale_and_round semantics).
        Works at any level (fewer limbs after mod_switch_to_next)."""
        x = self._dot_with_sk(sk, ct)
        base = self._base_for(x.shape[0])
        xc = base.compose_centered(x)
        num = xc * self.t
        m = (num + (base.Q // 2)) // base.Q  # floor((tx + Q/2)/Q), exact round
        return Plaintext((m % self.t).astype(np.uint64))

    def decrypt_batch(self, sk: SecretKey, ct: Ciphertext) -> np.ndarray:
        """Batched decrypt of a [size, B, k, N] ciphertext -> [B, N] mod t.

        The reference decrypts one ciphertext at a time on the CPU
        (``Analyst.cpp:352-381`` / SEAL ``decryptor.h``); at dataset scale
        (13,245 MIT-BIH results) a per-sample loop of host CRT composes is
        the bottleneck.  TPU-native split instead:

        - [c0 + c1 s]_q for the WHOLE batch in one jitted device program
          (NTT multiply per limb);
        - the t/Q scale-and-round ON DEVICE in the same program
          (SEAL RNSTool::decrypt_scale_and_round semantics, no bignums):
          with u_i = [x_i (Q/q_i)^{-1}]_{q_i},
          m = [sum_i floor(t u_i / q_i) + round(sum_i (t u_i mod q_i)/q_i)]_t
          (the -A*t*Q/Q term vanishes mod t).  Integer parts are exact in
          u32 (quotients < t; division by q_i via its mod-2^32 inverse);
          the fractional sum accumulates in f32, error <= k*2^-22 vs the
          >= 1/4 rounding margin any ciphertext with >= 1 bit of noise
          budget guarantees.  Only [B, N] u32 returns to the host (the
          former host loop pulled the full [B, k, N] limb tensor through
          the tunnel and was the analyst-side bottleneck at dataset scale).

        Bit-identical to ``decrypt`` + ``decode`` per sample (tested)."""
        import jax

        cd = ct.data
        size = cd.shape[0]
        assert cd.ndim == 4 and size in (2, 3), cd.shape
        kc = cd.shape[2]
        assert kc == self.k, "decrypt_batch supports full-level cts only"
        if not hasattr(self, "_dec_batch_jit"):
            from .modular import add_mod, mont_mul

            q, qi = self.tb_q.q, self.tb_q.qinv_neg
            t_int = int(self.t)
            # per-limb scale-and-round constants (device, [k, 1]):
            #   wm = (Q/q_i)^{-1} R mod q_i,  tm = t R mod q_i,
            #   qinv32 = q_i^{-1} mod 2^32 (exact-division multiplier)
            wm = np.array(
                [(int(w) << 32) % int(qm)
                 for w, qm in zip(self.base_q.inv, self.q_moduli)],
                np.uint32,
            )[:, None]
            tm = np.array(
                [(t_int << 32) % int(qm) for qm in self.q_moduli], np.uint32
            )[:, None]
            qinv32 = np.array(
                [pow(int(qm), -1, 1 << 32) for qm in self.q_moduli], np.uint32
            )[:, None]
            qf = np.array(self.q_moduli, np.float32)[:, None]
            wm, tm, qinv32, qf = map(jnp.asarray, (wm, tm, qinv32, qf))

            def dot(c, s_nm, s2_nm):
                f1 = ntt.ntt_fwd(c[1], self.tb_q)
                g = mont_mul(f1, s_nm, q, qi)
                if c.shape[0] == 3:
                    f2 = ntt.ntt_fwd(c[2], self.tb_q)
                    g = add_mod(g, mont_mul(f2, s2_nm, q, qi), q)
                x = add_mod(c[0], ntt.ntt_inv(g, self.tb_q), q)  # [B, k, N]
                # t/Q scale-and-round ON DEVICE (the former host loop moved
                # ~1 GB per 512-batch through the tunnel and dominated the
                # analyst at dataset scale).  Per limb, with
                # u_i = [x_i (Q/q_i)^{-1}]_{q_i}:  t*u_i = q_i*quot + r_i,
                # quot exactly via the mod-2^32 inverse (quot < t fits u32),
                # r_i/q_i accumulated in f32 — error <= k*2^-22, vs the
                # >=1/4 rounding margin any ciphertext with >=1 bit of
                # noise budget guarantees.
                u = mont_mul(x, wm, q, qi)
                r = mont_mul(u, tm, q, qi)
                a_lo = jnp.uint32(t_int) * u  # low 32 bits of t*u
                quot = (a_lo - r) * qinv32  # exact (t*u - r)/q_i
                int_sum = jnp.sum(quot, axis=-2, dtype=jnp.uint32)
                frac_sum = jnp.sum(
                    r.astype(jnp.float32) / qf, axis=-2, dtype=jnp.float32
                )
                m = int_sum + jnp.floor(frac_sum + 0.5).astype(jnp.uint32)
                return m % jnp.uint32(t_int)  # [B, N]

            self._dec_batch_jit = jax.jit(dot)
            self._dec_sk_cache: Dict[int, tuple] = {}
        skk = id(sk)
        if skk not in self._dec_sk_cache:
            from .modular import to_mont_host

            s = np.asarray(sk.s_q, np.uint64)  # [k, N] coeff domain
            s_nm, s2_nm = [], []
            for i, qm in enumerate(self.q_moduli):
                qm = int(qm)
                htb = ntt.build_host_tables(qm, self.n)
                f = ntt.ntt_fwd_host(s[i], htb)
                s_nm.append(to_mont_host(f, qm))
                s2_nm.append(
                    to_mont_host((f * f) % np.uint64(qm), qm)
                )  # NTT(s^2) = NTT(s)^2 pointwise
            s_nm, s2_nm = np.stack(s_nm), np.stack(s2_nm)
            # keep at most one cached key transform (keys rarely rotate)
            self._dec_sk_cache = {
                skk: (jnp.asarray(s_nm), jnp.asarray(s2_nm))
            }
        s_nm, s2_nm = self._dec_sk_cache[skk]
        return np.asarray(
            self._dec_batch_jit(cd, s_nm, s2_nm), np.uint64
        )  # [B, N] mod t

    def decode_batch(self, m: np.ndarray) -> np.ndarray:
        """[B, N] plaintext polys mod t -> [B, N] slot values (vectorized)."""
        slots = ntt.ntt_fwd_host(np.asarray(m, np.uint64), self.tb_t_host)
        return slots[:, self.encoder_map].astype(np.uint64)

    def decode_signed_batch(self, m: np.ndarray) -> np.ndarray:
        v = self.decode_batch(m).astype(np.int64)
        return np.where(v > self.t // 2, v - self.t, v)

    def noise_budget(self, sk: SecretKey, ct: Ciphertext) -> int:
        """Invariant noise budget in bits (SEAL Decryptor::invariant_noise_budget):
        log2(Q / (2*||[t*c(s)]_Q||_inf))."""
        x = self._dot_with_sk(sk, ct)
        base = self._base_for(x.shape[0])
        xi = base.compose(x)
        r = (xi * self.t) % base.Q
        half = base.Q // 2
        r = np.where(r > half, base.Q - r, r)
        mx = int(max(r.max(), 1))
        return max(0, base.Q.bit_length() - 1 - mx.bit_length() - 1)

    def mod_switch_to_next(self, ct: Ciphertext) -> Ciphertext:
        """Drop the last data limb with divide-and-round (SEAL
        Evaluator::mod_switch_to_next / RNSTool::divide_and_round_q_last:
        c'_i = [(c_i - [c + q_last/2]_{q_last} + q_last/2) / q_last]_{q_i}).
        Shrinks the ciphertext for transmission — the reference uses it for
        result-size accounting (SEAL_Cipher.cpp:363-378)."""
        c = np.asarray(ct.data, np.uint64)
        size, kc, n = c.shape
        assert kc >= 2, "already at the lowest level"
        q_last = self.q_moduli[kc - 1]
        half = q_last >> 1
        out = np.empty((size, kc - 1, n), np.uint64)
        invs = [
            pow(int(q_last), -1, int(self.q_moduli[i])) for i in range(kc - 1)
        ]
        for d in range(size):
            x_last = (c[d, kc - 1] + half) % q_last
            for i in range(kc - 1):
                qi = self.q_moduli[i]
                tmp = (x_last % qi + qi - half % qi) % qi
                out[d, i] = (((c[d, i] + qi - tmp) % qi) * invs[i]) % qi
        # explicit u32 cast: the Ciphertext invariant is u32 [size,k,N] data;
        # don't rely on jnp.asarray's x64-off downcast
        return Ciphertext(jnp.asarray(out.astype(np.uint32)))

    def mod_switch_to(self, ct: Ciphertext, levels: int) -> Ciphertext:
        """Apply mod_switch_to_next `levels` times."""
        for _ in range(levels):
            ct = self.mod_switch_to_next(ct)
        return ct

    # ------------------------------------------------------------------
    # Plaintext device preparation (for evaluator)
    # ------------------------------------------------------------------

    def plain_for_mul(self, pt: Plaintext) -> jnp.ndarray:
        """Plaintext -> [k, N] NTT+Mont over base q for pointwise ct*pt."""
        m = np.asarray(pt.data, np.uint64)
        out = np.empty((self.k, self.n), np.uint64)
        for i, q in enumerate(self.q_moduli):
            tb = ntt.build_host_tables(q, self.n)
            f = ntt.ntt_fwd_host(m % q, tb)
            out[i] = (f << np.uint64(32)) % np.uint64(q)
        return jnp.asarray(out.astype(np.uint32))

    def plain_for_add(self, pt: Plaintext) -> jnp.ndarray:
        """Plaintext -> [k, N] u32 coeff-domain round(Q m / t) for ct + pt."""
        return jnp.asarray(self.scale_plain(pt).astype(np.uint32))

    def plain_for_mul_batch(self, polys: np.ndarray) -> jnp.ndarray:
        """[..., N] plaintext polys mod t -> [..., k, N] NTT+Mont device tensor."""
        m = np.asarray(polys, np.uint64)
        out = np.empty(m.shape[:-1] + (self.k, self.n), np.uint64)
        for i, q in enumerate(self.q_moduli):
            tb = ntt.build_host_tables(q, self.n)
            f = ntt.ntt_fwd_host(m % q, tb)
            out[..., i, :] = (f << np.uint64(32)) % np.uint64(q)
        return jnp.asarray(out.astype(np.uint32))

    def plain_for_mul_qp_batch(self, polys: np.ndarray) -> jnp.ndarray:
        """[..., N] plaintext polys mod t -> [..., k+1, N] NTT+Mont over
        q ∪ P (for multiplying lazily-accumulated key-switch sums)."""
        m = np.asarray(polys, np.uint64)
        pq = self.base_qp.moduli
        out = np.empty(m.shape[:-1] + (len(pq), self.n), np.uint64)
        for i, q in enumerate(pq):
            tb = ntt.build_host_tables(q, self.n)
            f = ntt.ntt_fwd_host(m % q, tb)
            out[..., i, :] = (f << np.uint64(32)) % np.uint64(q)
        return jnp.asarray(out.astype(np.uint32))

    def plain_for_add_batch(self, polys: np.ndarray) -> jnp.ndarray:
        """[..., N] plaintext polys mod t -> [..., k, N] scaled round(Q m / t)."""
        m = np.asarray(polys, np.uint64)
        prod = (self.q_mod_t * m).astype(np.uint64)
        fix = (prod + np.uint64((self.t + 1) // 2)) // np.uint64(self.t)
        out = np.empty(m.shape[:-1] + (self.k, self.n), np.uint64)
        for i, q in enumerate(self.q_moduli):
            out[..., i, :] = (self.delta_mod_q[i] * (m % q) + fix) % q
        return jnp.asarray(out.astype(np.uint32))


def large_params(data_limbs: int = 58, seed: int = 0) -> BFVParams:
    """The reference's large preset: degree 65536 with a 1740-bit custom
    modulus chain and ``sec_level_type::none`` (``SEAL_Cipher.cpp:47-61``,
    29 x 60-bit primes there).  Here: 58 x 30-bit data limbs (same usable
    bits) and a 29-bit NTT-friendly plaintext modulus (t = 65537 cannot
    batch at this degree since t-1 must divide 2N)."""
    t = primes.ntt_primes(65536, 29, 1)[0]
    return BFVParams(n=65536, t=t, data_limbs=data_limbs, seed=seed)


@functools.lru_cache(maxsize=4)
def default_context(n: int = 16384, seed: int = 0) -> Context:
    if n >= 4096:
        limbs = {4096: 4, 8192: 7, 16384: 13, 32768: 26}[n]
    else:
        limbs = 3
    return Context(BFVParams(n=n, data_limbs=limbs, seed=seed))
