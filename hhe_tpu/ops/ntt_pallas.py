"""Fused Pallas NTT: the whole transform in VMEM, one kernel per polynomial.

The XLA butterfly NTT (``ops/ntt.py``) materializes every one of the
log2(N) stages through HBM; at N=16384 that is ~3 ms per [13,14,N] batch
(~0.84 Gelem/s) while the underlying u32 Montgomery math runs at
~70 Gelem/s.  This kernel keeps the polynomial resident in VMEM:

- View the N-coefficient polynomial as an [R, 128] matrix (R = N/128, the
  TPU lane width).  Linear index i = r*128 + c.
- The first log2(R) butterfly stages have stride >= 128: pairs are whole
  rows, so each stage is a free row-regrouping plus one VPU-wide
  multiply/add/sub.
- One in-VMEM transpose turns the remaining 7 sub-lane-stride stages into
  row-stride stages too; a final transpose restores linear order.
- Stage twiddles are *separable*: with i = r*128 + c and group index
  k = k1*K + k2 occupying disjoint bit ranges, the merged-psi table entry
  psi_br[2^g + k] = Mont(psi^(rev(2^g) )) * Mont-product of a per-lane and a
  per-row factor, so the post-transpose stages need only a [7,128] and a
  [7,R] vector per limb instead of [7,128,R] matrices.

Outputs are bit-identical to ``ntt.ntt_fwd`` / ``ntt.ntt_inv`` (same
natural -> bit-reversed convention); ``ntt.py`` dispatches here on TPU.

Reference counterpart: SEAL's ``seal/util/ntt.h`` / ``dwthandler.h``
(scalar Harvey butterflies).
"""

from __future__ import annotations

import functools
import math
from typing import Dict, NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from . import modular, primes
from .modular import add_mod, mont_mul, sub_mod


# registry: id(NttTables) -> moduli tuple (filled by ntt.build_tables)
MODULI_OF: Dict[int, Tuple[int, ...]] = {}


class PallasNttTables(NamedTuple):
    q: jnp.ndarray  # [k, 1] u32
    qi: jnp.ndarray  # [k, 1] u32
    tw_row: jnp.ndarray  # [k, Srow, R, 1] u32 Mont — row-stage twiddle per row
    ro: jnp.ndarray  # [k, 7, 128, 1] u32 Mont — lane-stage per-Y-row factor
    la: jnp.ndarray  # [k, 7, R] u32 Mont — lane-stage per-Y-lane factor
    ninv: jnp.ndarray  # [k, 1] u32 Mont (inverse only; ones for forward)


def _rev_bits(x: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (bits - 1 - b)
    return out


@functools.lru_cache(maxsize=64)
def _build(moduli: Tuple[int, ...], n: int, inverse: bool) -> PallasNttTables:
    """Host-precomputed separable twiddle tables (tiny: O(k * log N * 128))."""
    L = n.bit_length() - 1
    R = n // 128
    assert R >= 1 and R * 128 == n
    srow = L - 7  # number of row-stride stages
    k = len(moduli)
    tw_row = np.zeros((k, max(srow, 1), R, 1), np.uint32)
    ro = np.zeros((k, 7, 128, 1), np.uint32)
    la = np.zeros((k, 7, R), np.uint32)
    q_arr = np.zeros((k, 1), np.uint32)
    qi_arr = np.zeros((k, 1), np.uint32)
    ninv = np.zeros((k, 1), np.uint32)
    for t_i, q in enumerate(moduli):
        qinv_neg, _, _ = modular.mont_constants(q)
        q_arr[t_i, 0] = q
        qi_arr[t_i, 0] = qinv_neg
        psi = primes.root_of_unity(2 * n, q)
        if inverse:
            psi = pow(psi, -1, q)
            ninv[t_i, 0] = modular.to_mont_host(np.uint64(pow(n, -1, q)), q)
        else:
            ninv[t_i, 0] = modular.to_mont_host(np.uint64(1), q)
        # row stages: global stage g in [0, srow): tw[r] = psi^rev(2^g + (r >> (srow - g)))
        for g in range(srow):
            for r in range(R):
                e = _rev_bits((1 << g) + (r >> (srow - g)), L)
                tw_row[t_i, g, r, 0] = modular.to_mont_host(
                    np.uint64(pow(psi, e, q)), q
                )
        # lane stages: global stage g = srow + s2, t = 128 >> (s2+1),
        # K = 128 // (2t); group k = r*K + (c >> log2(2t)) with r the Y-lane
        # (original row) and c the Y-row (original column).
        for s2 in range(7):
            g = srow + s2
            t = 128 >> (s2 + 1)
            K = 128 // (2 * t)
            base = _rev_bits(1 << g, L)  # = 2^(L-1-g)
            for r in range(R):
                la[t_i, s2, r] = modular.to_mont_host(
                    np.uint64(pow(psi, _rev_bits(r * K, L), q)), q
                )
            for c in range(128):
                e = base + _rev_bits(c >> int(math.log2(2 * t)), L)
                ro[t_i, s2, c, 0] = modular.to_mont_host(
                    np.uint64(pow(psi, e, q)), q
                )
    # may be reached first from inside a jit trace; the cached tables must be
    # concrete device arrays, not trace-level constants
    with jax.ensure_compile_time_eval():
        return PallasNttTables(
            q=jnp.asarray(q_arr),
            qi=jnp.asarray(qi_arr),
            tw_row=jnp.asarray(tw_row),
            ro=jnp.asarray(ro),
            la=jnp.asarray(la),
            ninv=jnp.asarray(ninv),
        )


def _fwd_kernel(q_ref, qi_ref, twrow_ref, ro_ref, la_ref, x_ref, o_ref):
    l = pl.program_id(0)
    q = q_ref[l, 0]
    qi = qi_ref[l, 0]
    x = x_ref[0, 0]  # [R, 128] u32, linear index i = r*128 + c
    R = x.shape[0]
    srow = R.bit_length() - 1

    # row-stride stages (free row regroupings)
    for g in range(srow):
        m = 1 << g
        half = R >> (g + 1)
        xv = x.reshape(m, 2, half, 128)
        tw = twrow_ref[0, g].reshape(m, 2, half, 1)[:, 0]  # [m, half, 1]
        u = xv[:, 0]
        v = mont_mul(xv[:, 1], tw, q, qi)
        x = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)], 1).reshape(R, 128)

    # transpose: remaining sub-lane strides become row strides
    y = x.T  # [128, R]
    for s2 in range(7):
        t = 128 >> (s2 + 1)
        grp = 128 // (2 * t)
        yv = y.reshape(grp, 2, t, R)
        rov = ro_ref[0, s2].reshape(grp, 2, t, 1)[:, 0]  # [grp, t, 1]
        lav = la_ref[0, s2, :].reshape(1, 1, R)
        tw = mont_mul(rov, lav, q, qi)  # [grp, t, R] Mont(psi^e)
        u = yv[:, 0]
        v = mont_mul(yv[:, 1], tw, q, qi)
        y = jnp.stack([add_mod(u, v, q), sub_mod(u, v, q)], 1).reshape(128, R)
    o_ref[0, 0] = y.T


def _inv_kernel(q_ref, qi_ref, twrow_ref, ro_ref, la_ref, ninv_ref, x_ref, o_ref):
    l = pl.program_id(0)
    q = q_ref[l, 0]
    qi = qi_ref[l, 0]
    x = x_ref[0, 0]  # [R, 128]
    R = x.shape[0]
    srow = R.bit_length() - 1

    # lane stages first (descending g: t = 1..64), in the transposed frame
    y = x.T  # [128, R]
    for s2 in range(6, -1, -1):
        t = 128 >> (s2 + 1)
        grp = 128 // (2 * t)
        yv = y.reshape(grp, 2, t, R)
        rov = ro_ref[0, s2].reshape(grp, 2, t, 1)[:, 0]
        lav = la_ref[0, s2, :].reshape(1, 1, R)
        tw = mont_mul(rov, lav, q, qi)
        u = yv[:, 0]
        v = yv[:, 1]
        y = jnp.stack(
            [add_mod(u, v, q), mont_mul(sub_mod(u, v, q), tw, q, qi)], 1
        ).reshape(128, R)
    x = y.T  # [R, 128]

    # row stages (descending g), then the final 1/N scaling
    for g in range(srow - 1, -1, -1):
        m = 1 << g
        half = R >> (g + 1)
        xv = x.reshape(m, 2, half, 128)
        tw = twrow_ref[0, g].reshape(m, 2, half, 1)[:, 0]
        u = xv[:, 0]
        v = xv[:, 1]
        x = jnp.stack(
            [add_mod(u, v, q), mont_mul(sub_mod(u, v, q), tw, q, qi)], 1
        ).reshape(R, 128)
    o_ref[0, 0] = mont_mul(x, ninv_ref[l, 0], q, qi)


def _call(x: jnp.ndarray, tabs: PallasNttTables, inverse: bool, interpret: bool):
    *lead, k, n = x.shape
    R = n // 128
    srow_dim = tabs.tw_row.shape[1]
    b = 1
    for d in lead:
        b *= d
    xr = x.reshape(b, k, R, 128)
    kernel = _inv_kernel if inverse else _fwd_kernel
    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # q [k,1], indexed by program_id
        pl.BlockSpec(memory_space=pltpu.SMEM),  # qi
        pl.BlockSpec((1, srow_dim, R, 1), lambda l, bb: (l, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 7, 128, 1), lambda l, bb: (l, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 7, R), lambda l, bb: (l, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [tabs.q, tabs.qi, tabs.tw_row, tabs.ro, tabs.la]
    if inverse:
        specs.append(pl.BlockSpec(memory_space=pltpu.SMEM))
        args.append(tabs.ninv)
    specs.append(
        pl.BlockSpec((1, 1, R, 128), lambda l, bb: (bb, l, 0, 0), memory_space=pltpu.VMEM)
    )
    out = pl.pallas_call(
        kernel,
        grid=(k, b),
        in_specs=specs,
        out_specs=pl.BlockSpec(
            (1, 1, R, 128), lambda l, bb: (bb, l, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, k, R, 128), jnp.uint32),
        interpret=interpret,
    )(*args, xr)
    return out.reshape(*lead, k, n)


def ntt_fwd(x: jnp.ndarray, tb, interpret: bool = False) -> jnp.ndarray:
    """Forward negacyclic NTT, bit-identical to ``ntt.ntt_fwd``.

    ``tb`` is an ``ntt.NttTables`` whose moduli were registered at build time.
    """
    moduli = MODULI_OF[id(tb)]
    return _call(x, _build(moduli, x.shape[-1], False), False, interpret)


def ntt_inv(x: jnp.ndarray, tb, interpret: bool = False) -> jnp.ndarray:
    """Inverse negacyclic NTT, bit-identical to ``ntt.ntt_inv``."""
    moduli = MODULI_OF[id(tb)]
    return _call(x, _build(moduli, x.shape[-1], True), True, interpret)


def supported(x_shape, tb) -> bool:
    n = x_shape[-1]
    return (
        id(tb) in MODULI_OF
        and n >= 256
        and (n & (n - 1)) == 0
        and len(x_shape) >= 2
    )
