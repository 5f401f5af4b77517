"""Multi-chip NTT: a single polynomial sharded across the device mesh.

The reference has no counterpart (SEAL's NTT is single-threaded scalar code,
``seal/util/ntt.h``); this is the new-capability axis from BASELINE.json —
scaling one large polynomial (the reference's 65536 preset,
``SEAL_Cipher.cpp:47-61``) across chips.

Four-step decomposition over N = N1 * N2 with the polynomial's coefficient
axis sharded over the ``poly`` mesh axis:

    view v = x * psi_N^i as an [N1, N2] row-major matrix, rows sharded
    1. all_to_all transpose                 (ICI — half the communication)
    2. local cyclic DFT_N1 along rows
    3. local twiddle by w_N^(i2 * k1)
    4. all_to_all transpose back            (ICI — the other half)
    5. local cyclic DFT_N2 along rows

Local cyclic DFTs reuse the single-chip negacyclic kernels via
``DFT_M(u)[j] = NTT_M(u * psi_M^-i)[rev(j)]`` (the pre-twist cancels the
negacyclic fold).  Forward output is the fixed digit/bit-reversed
permutation out[k1' * N2 + k2'] = DFT_N[rev1(k1') + N1*rev2(k2')]; the
inverse consumes exactly that order and pointwise products are
order-independent, so fwd/mul/inv compose exactly like the single-chip NTT.

All twist/twiddle constants are sharded along the same axis as the data, so
steps 2/3/5 are fully local; only the transposes ride the ICI.

**Large-preset evaluator decision (measured, round 4).**  At the reference's
N=65536 preset (``SEAL_Cipher.cpp:47-68``) this sharded NTT backs *keygen*
(``Context.keygen_public(mesh=...)``, exercised at the full 58-limb chain in
``tests/test_large_preset.py``), while the transcipher/evaluator keeps
single-chip NTT tables.  Why: the measured single-chip keystream block at
that degree is **281 ms** (8 limbs, BENCH_r04 ``large_preset`` stage) with
every per-limb transform only ~2 ms of it — the block is dominated by the
same key-switch/permute work as the 16384 path, not by any one transform.
Sharding the polynomial axis would put TWO all_to_all transposes of the
full [limbs, N] working set on the ICI *inside every one* of the ~26
key-switches per block (~4 MB per transform crossing the interconnect each
way), while the single-chip tables at 8-16 limbs fit comfortably in HBM
(~8 MB of twiddles + the 280 MB MXU perm set).  Poly-axis sharding pays off
for the *throughput* story instead: batch (dp) x limb (tp) sharding already
scales samples across chips bit-exactly
(``tests/test_parallel.py::test_sharded_transcipher_hot_path_bitexact``)
with zero intra-key-switch collectives — so one chip per block, many blocks
per pod.  Keygen is the one place a single 65536-degree transform stands
alone (pk = a*s at full width, once), which is why ShardedNtt backs exactly
that path.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax import lax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from ..ops import modular, ntt, primes
from ..ops.modular import mont_mul


class ShardNttPlan(NamedTuple):
    """Host-built constants for one (moduli, N, D) sharded transform.

    Layout notes: [k, N] tensors are flattened matrices in the layout of the
    step that consumes them, so they shard with the data over the last axis.
    """

    n1: int
    n2: int
    d: int
    tb1: ntt.NttTables  # negacyclic tables, size n1 (local DFT_N1)
    tb2: ntt.NttTables  # size n2 (local DFT_N2)
    pre: jnp.ndarray  # [k, N] Mont psi_N^i,   (i1, i2) layout
    mid_f: jnp.ndarray  # [k, N] Mont psi_N1^-i1, (i2, i1) layout
    tw_f: jnp.ndarray  # [k, N] Mont w_N^(i2*rev1(k1')), (i2, k1') layout
    tw_i: jnp.ndarray  # [k, N] Mont w_N^-(i2*rev1(k1'))
    mid_i: jnp.ndarray  # [k, N] Mont psi_N1^+i1, (i2, i1) layout
    post: jnp.ndarray  # [k, N] Mont psi_N^-i,  (i1, i2) layout
    psi2_i: jnp.ndarray  # [k, n2] Mont psi_N2^-i2 (row twist, replicated)
    psi2: jnp.ndarray  # [k, n2] Mont psi_N2^+i2
    r2: jnp.ndarray  # [k, 1] R^2 mod q (standard->Mont lift)


def _mont_rows(vals: np.ndarray, moduli) -> jnp.ndarray:
    out = np.empty(vals.shape, np.uint32)
    for i, q in enumerate(moduli):
        out[i] = modular.to_mont_host(vals[i] % np.uint64(q), q)
    return jnp.asarray(out)


@functools.lru_cache(maxsize=8)
def build_plan(moduli: Tuple[int, ...], n: int, d: int) -> ShardNttPlan:
    n1 = 1 << ((n.bit_length() - 1) // 2)
    n2 = n // n1
    assert n1 % d == 0 and n2 % d == 0, (n1, n2, d)
    k = len(moduli)
    tb1 = ntt.build_tables(moduli, n1)
    tb2 = ntt.build_tables(moduli, n2)
    rev1 = ntt.bit_reverse_indices(n1)

    pre = np.empty((k, n), np.uint64)
    mid_f = np.empty((k, n), np.uint64)
    tw_f = np.empty((k, n), np.uint64)
    tw_i = np.empty((k, n), np.uint64)
    mid_i = np.empty((k, n), np.uint64)
    post = np.empty((k, n), np.uint64)
    psi2_i = np.empty((k, n2), np.uint64)
    psi2p = np.empty((k, n2), np.uint64)
    r2 = np.empty((k, 1), np.uint32)
    i1g, i2g = np.meshgrid(np.arange(n1), np.arange(n2), indexing="ij")
    i_lin = i1g * n2 + i2g
    for t, q in enumerate(moduli):
        psi_n = primes.root_of_unity(2 * n, q)
        om = psi_n * psi_n % q  # N-th root
        psi1 = primes.root_of_unity(2 * n1, q)
        psi2 = primes.root_of_unity(2 * n2, q)
        r2[t, 0] = pow(1 << 32, 2, q)

        def pows(base, e_arr):
            e = np.asarray(e_arr)
            uniq, inv = np.unique(e.ravel(), return_inverse=True)
            tbl = np.array([pow(int(base), int(v), q) for v in uniq], np.uint64)
            return tbl[inv].reshape(e.shape)

        pre[t] = pows(psi_n, i_lin).ravel()
        post[t] = pows(pow(psi_n, -1, q), i_lin).ravel()
        mid_f[t] = pows(
            pow(psi1, -1, q), np.broadcast_to(np.arange(n1), (n2, n1))
        ).ravel()
        mid_i[t] = pows(psi1, np.broadcast_to(np.arange(n1), (n2, n1))).ravel()
        k1_true = np.broadcast_to(rev1[None, :], (n2, n1))
        i2col = np.arange(n2)[:, None]
        tw_f[t] = pows(om, (i2col * k1_true) % n).ravel()
        tw_i[t] = pows(pow(om, -1, q), (i2col * k1_true) % n).ravel()
        psi2_i[t] = pows(pow(psi2, -1, q), np.arange(n2))
        psi2p[t] = pows(psi2, np.arange(n2))
    return ShardNttPlan(
        n1=n1,
        n2=n2,
        d=d,
        tb1=tb1,
        tb2=tb2,
        pre=_mont_rows(pre, moduli),
        mid_f=_mont_rows(mid_f, moduli),
        tw_f=_mont_rows(tw_f, moduli),
        tw_i=_mont_rows(tw_i, moduli),
        mid_i=_mont_rows(mid_i, moduli),
        post=_mont_rows(post, moduli),
        psi2_i=_mont_rows(psi2_i, moduli),
        psi2=_mont_rows(psi2p, moduli),
        r2=jnp.asarray(r2),
    )


def _transpose_a2a(x: jnp.ndarray, d: int, axis: str) -> jnp.ndarray:
    """Global row-sharded [rows, cols] -> row-sharded [cols, rows] transpose.

    x: [..., r, c] local chunk of a [d*r, c] global matrix; returns
    [..., c // d, d * r]."""
    *lead, r, c = x.shape
    pos = len(lead)
    xs = x.reshape(*lead, r, d, c // d)
    # device p sends its column-group j to device j; received row-chunks
    # stack in peer order, which IS global row order after the merge
    y = lax.all_to_all(xs, axis, split_axis=pos + 1, concat_axis=pos)
    return jnp.swapaxes(y.reshape(*lead, d * r, c // d), -1, -2)


def _fwd_local(xl, pre_l, midf_l, twf_l, psi2_i, plan: ShardNttPlan, axis: str):
    """Per-device forward body.  xl: [k, N/d], rows-(i1)-major chunk."""
    k = xl.shape[0]
    n1, n2, d = plan.n1, plan.n2, plan.d
    q, qi = plan.tb1.q, plan.tb1.qinv_neg
    v = mont_mul(xl, pre_l, q, qi).reshape(k, n1 // d, n2)
    y = _transpose_a2a(v, d, axis)  # [k, n2/d, n1] — (i2, i1) layout
    y = jnp.swapaxes(y, 0, 1)  # [n2/d, k, n1] (ntt wants [..., k, M])
    y = mont_mul(y, jnp.swapaxes(midf_l.reshape(k, n2 // d, n1), 0, 1), q, qi)
    c = ntt.ntt_fwd(y, plan.tb1)  # local cyclic DFT_N1 (bit-rev k1')
    c = mont_mul(c, jnp.swapaxes(twf_l.reshape(k, n2 // d, n1), 0, 1), q, qi)
    c = jnp.swapaxes(c, 0, 1)  # [k, n2/d, n1]
    w = _transpose_a2a(c, d, axis)  # [k, n1/d, n2] — (k1', i2) layout
    w = jnp.swapaxes(w, 0, 1)  # [n1/d, k, n2]
    out = ntt.ntt_fwd(mont_mul(w, psi2_i, q, qi), plan.tb2)
    return jnp.swapaxes(out, 0, 1).reshape(k, n1 // d * n2)


def _inv_local(xl, twi_l, midi_l, post_l, psi2, plan: ShardNttPlan, axis: str):
    """Per-device inverse body.  xl: [k, N/d] in fwd output order."""
    k = xl.shape[0]
    n1, n2, d = plan.n1, plan.n2, plan.d
    q, qi = plan.tb1.q, plan.tb1.qinv_neg
    w = jnp.swapaxes(xl.reshape(k, n1 // d, n2), 0, 1)  # [n1/d, k, n2]
    w = mont_mul(ntt.ntt_inv(w, plan.tb2), psi2, q, qi)  # undo DFT_N2
    w = jnp.swapaxes(w, 0, 1)  # [k, n1/d, n2]
    c = _transpose_a2a(w, d, axis)  # [k, n2/d, n1] — (i2, k1') layout
    c = jnp.swapaxes(c, 0, 1)  # [n2/d, k, n1]
    c = mont_mul(c, jnp.swapaxes(twi_l.reshape(k, n2 // d, n1), 0, 1), q, qi)
    y = mont_mul(
        ntt.ntt_inv(c, plan.tb1),
        jnp.swapaxes(midi_l.reshape(k, n2 // d, n1), 0, 1),
        q,
        qi,
    )
    y = jnp.swapaxes(y, 0, 1)  # [k, n2/d, n1]
    v = _transpose_a2a(y, d, axis)  # [k, n1/d, n2] — (i1, i2) layout
    return mont_mul(v.reshape(k, -1), post_l, q, qi)


class ShardedNtt:
    """Sharded negacyclic NTT + pointwise algebra over a device mesh.

    A [k, N] RNS polynomial is sharded over the mesh's ``poly`` axis (last
    dim).  ``fwd``/``inv`` are inverse bijections sharing one fixed output
    permutation, so ``inv(pointwise_mul(fwd(a), fwd(b)))`` is the exact
    negacyclic product — the multi-chip version of ``ntt.negacyclic_mul``.
    """

    def __init__(self, moduli, n: int, mesh: Mesh, axis: str = "poly"):
        from jax.experimental.shard_map import shard_map

        self.moduli = tuple(int(m) for m in moduli)
        self.n = n
        self.mesh = mesh
        self.axis = axis
        self.d = mesh.shape[axis]
        self.plan = build_plan(self.moduli, n, self.d)
        self.sh = NamedSharding(mesh, P(None, axis))
        plan, ax = self.plan, axis
        spec = P(None, axis)
        rep = P(None, None)
        self._fwd = jax.jit(
            shard_map(
                lambda x, a, b, c, p2: _fwd_local(x, a, b, c, p2, plan, ax),
                mesh=mesh,
                in_specs=(spec, spec, spec, spec, rep),
                out_specs=spec,
                check_rep=False,
            )
        )
        self._inv = jax.jit(
            shard_map(
                lambda x, a, b, c, p2: _inv_local(x, a, b, c, p2, plan, ax),
                mesh=mesh,
                in_specs=(spec, spec, spec, spec, rep),
                out_specs=spec,
                check_rep=False,
            )
        )

    def shard(self, x) -> jnp.ndarray:
        return jax.device_put(jnp.asarray(x, jnp.uint32), self.sh)

    def fwd(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.plan
        return self._fwd(x, p.pre, p.mid_f, p.tw_f, p.psi2_i)

    def inv(self, x: jnp.ndarray) -> jnp.ndarray:
        p = self.plan
        return self._inv(x, p.tw_i, p.mid_i, p.post, p.psi2)

    def pointwise_mul(self, fa: jnp.ndarray, fb: jnp.ndarray) -> jnp.ndarray:
        """Product of two fwd-domain (standard-domain) tensors."""
        tb = self.plan.tb1
        fb_m = mont_mul(fb, self.plan.r2, tb.q, tb.qinv_neg)
        return mont_mul(fa, fb_m, tb.q, tb.qinv_neg)

    def negacyclic_mul(self, a, b) -> jnp.ndarray:
        """Exact sharded negacyclic product of coefficient-domain inputs."""
        return self.inv(
            self.pointwise_mul(self.fwd(self.shard(a)), self.fwd(self.shard(b)))
        )
