"""Fused Pallas NTT: the whole transform in VMEM, one kernel per polynomial.

The XLA butterfly NTT (``ops/ntt.py``) materializes every one of the
log2(N) stages through HBM; at N=16384 that is ~3 ms per [13,14,N] batch
(~0.84 Gelem/s) while the underlying u32 Montgomery math runs at
~70 Gelem/s.  This kernel keeps the polynomial resident in VMEM:

- View the N-coefficient polynomial as an [R, 128] matrix (R = N/128, the
  TPU lane width).  Linear index i = r*128 + c.
- The first log2(R) butterfly stages pair whole rows; one in-VMEM
  transpose turns the remaining 7 sub-lane-stride stages into row-stride
  stages too; a final transpose restores linear order.
- **Every stage is full-array roll + mask arithmetic** — NO slicing or
  stacking.  The textbook in-place butterfly expressed as strided slices +
  ``jnp.stack`` interleaves made Mosaic materialize a gather and a scatter
  per stage: measured ~85% of kernel time (round-5 probes — removing
  arithmetic moved nothing, and the ascending-stride order of the inverse
  was 2.7x slower still).  In roll form each element computes its own
  output from its partner (one +stride and one -stride roll) under a
  parity mask; measured 2x faster forward and 5x faster inverse
  (both directions ~47 G butterflies/s at N=16384/13 limbs, TPU v5e).
- Twiddles are stored per-POSITION (row stages [R, 1]; merged lane-stage
  tables [7, 128, R] built host-side as outer products), so the kernel
  reads them with zero address arithmetic.
- **Lazy reduction** (Harvey style, SEAL ``seal/util/ntt.h:195-251``):
  when every modulus of the table is < 2^30, butterflies keep values in
  [0, 4q) forward / [0, 2q) inverse — one conditional subtract per
  butterfly instead of three — and a final correction restores [0, q).
  Outputs are bit-identical to the eager path (which remains for >= 2^30
  moduli, e.g. the 31-bit BEHZ auxiliary base).

Outputs are bit-identical to ``ntt.ntt_fwd`` / ``ntt.ntt_inv`` (same
natural -> bit-reversed convention); ``ntt.py`` dispatches here on TPU.

Reference counterpart: SEAL's ``seal/util/ntt.h`` / ``dwthandler.h``
(scalar Harvey lazy butterflies).
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
from .modular import add_mod, mont_mul, mont_mul_lazy, sub_mod


# registry: id(NttTables) -> moduli tuple (filled by ntt.build_tables)
MODULI_OF: Dict[int, Tuple[int, ...]] = {}


class PallasNttTables(NamedTuple):
    q: jnp.ndarray  # [k, 1] u32
    qi: jnp.ndarray  # [k, 1] u32
    tw_row: jnp.ndarray  # [k, Srow, R, 1] u32 Mont — row-stage twiddle per row
    lane: jnp.ndarray  # [k, 7, 128, R] u32 Mont — merged lane-stage twiddles
    ninv: jnp.ndarray  # [k, 1] u32 Mont (inverse only; ones for forward)
    lazy: bool  # all moduli < 2^30 -> Harvey lazy butterflies


def _rev_bits(x: int, bits: int) -> int:
    out = 0
    for b in range(bits):
        out |= ((x >> b) & 1) << (bits - 1 - b)
    return out


@functools.lru_cache(maxsize=64)
def _build(moduli: Tuple[int, ...], n: int, inverse: bool) -> PallasNttTables:
    """Host-precomputed twiddle tables (O(k * (log N * R + 7 * 128 * R)))."""
    L = n.bit_length() - 1
    R = n // 128
    assert R >= 1 and R * 128 == n
    srow = L - 7  # number of row-stride stages
    k = len(moduli)
    tw_row = np.zeros((k, max(srow, 1), R, 1), np.uint32)
    lane = np.zeros((k, 7, 128, R), np.uint32)
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
        # lane stages (in the transposed [128, R] frame): global stage
        # g = srow + s2, t = 128 >> (s2+1); butterfly (Y-row c, Y-lane r)
        # twiddle exponent = rev(2^g) + rev(c >> log2(2t)) + rev(r*K) with
        # K = 128/(2t).  Merged table built as an outer product of the two
        # standard-domain factors, then lifted to Montgomery — no modpow
        # per entry, no in-kernel factor multiply.
        for s2 in range(7):
            g = srow + s2
            t = 128 >> (s2 + 1)
            K = 128 // (2 * t)
            base = _rev_bits(1 << g, L)  # = 2^(L-1-g)
            row_f = np.array(
                [
                    pow(psi, base + _rev_bits(c >> int(math.log2(2 * t)), L), q)
                    for c in range(128)
                ],
                np.uint64,
            )
            lane_f = np.array(
                [pow(psi, _rev_bits(r * K, L), q) for r in range(R)], np.uint64
            )
            merged = (row_f[:, None] * lane_f[None, :]) % np.uint64(q)
            lane[t_i, s2] = modular.to_mont_host(merged, q)
    lazy = all(q < (1 << 30) for q in moduli)
    # may be reached first from inside a jit trace; the cached tables must be
    # concrete device arrays, not trace-level constants
    with jax.ensure_compile_time_eval():
        return PallasNttTables(
            q=jnp.asarray(q_arr),
            qi=jnp.asarray(qi_arr),
            tw_row=jnp.asarray(tw_row),
            lane=jnp.asarray(lane),
            ninv=jnp.asarray(ninv),
            lazy=lazy,
        )


def _iota0(nrows, ncols):
    return jax.lax.broadcasted_iota(jnp.int32, (nrows, ncols), 0)


def _fwd_kernel(lazy, q_ref, qi_ref, twrow_ref, lane_ref, x_ref, o_ref):
    """Forward kernel: every stage is FULL-ARRAY arithmetic — two rolls and
    a mask-select instead of slice/stack interleaves.

    The butterfly is in-place (out[j], out[j+half] overwrite x[j],
    x[j+half]), but expressing it as strided slices + jnp.stack made
    Mosaic materialize a gathered copy and an interleave scatter per stage
    — measured ~85% of kernel time (round-5 probes: arithmetic-only changes
    moved nothing; the roll form is 2x faster fwd, 5x inverse).  Here every
    element computes its own output: the partner value arrives by a
    +/-half roll, the group twiddle is stored per-position (tw_row [R, 1],
    lane [128, R]), and a parity mask selects the u/v expression.  Lazy
    variant (all q < 2^30) keeps values in [0, 4q) with ONE select per
    butterfly (Harvey, cf. SEAL seal/util/ntt.h:195-251)."""
    l = pl.program_id(0)
    q = q_ref[l, 0]
    qi = qi_ref[l, 0]
    x = x_ref[0, 0]  # [R, 128] u32, linear index i = r*128 + c
    R = x.shape[0]
    srow = R.bit_length() - 1
    two_q = q + q  # < 2^31 when lazy (q < 2^30)

    def stage(x, stride, tw, iot):
        is_lo = (iot & stride) == 0
        if lazy:
            xr = jnp.where(x >= two_q, x - two_q, x)  # [0, 2q)
            w = mont_mul_lazy(x, tw, q, qi)  # [0, 2q), valid at hi
            out_lo = xr + jnp.roll(w, -stride, axis=0)
            out_hi = jnp.roll(xr, stride, axis=0) + two_q - w
        else:
            w = mont_mul(x, tw, q, qi)
            out_lo = add_mod(x, jnp.roll(w, -stride, axis=0), q)
            out_hi = sub_mod(jnp.roll(x, stride, axis=0), w, q)
        return jnp.where(is_lo, out_lo, out_hi)

    # row-stride stages
    ri = _iota0(R, 128)
    for g in range(srow):
        x = stage(x, R >> (g + 1), twrow_ref[0, g], ri)

    # transpose: remaining sub-lane strides become row strides
    y = x.T  # [128, R]
    ci = _iota0(128, R)
    for s2 in range(7):
        y = stage(y, 128 >> (s2 + 1), lane_ref[0, s2], ci)
    if lazy:  # restore [0, q)
        y = jnp.where(y >= two_q, y - two_q, y)
        y = jnp.where(y >= q, y - q, y)
    o_ref[0, 0] = y.T


def _inv_kernel(lazy, q_ref, qi_ref, twrow_ref, lane_ref, ninv_ref, x_ref, o_ref):
    """Inverse kernel, same roll+mask structure (see _fwd_kernel).  The
    Gentleman-Sande butterfly multiplies the difference: lazy keeps values
    in [0, 2q) throughout."""
    l = pl.program_id(0)
    q = q_ref[l, 0]
    qi = qi_ref[l, 0]
    x = x_ref[0, 0]  # [R, 128]
    R = x.shape[0]
    srow = R.bit_length() - 1
    two_q = q + q

    def stage(y, stride, tw, iot):
        is_lo = (iot & stride) == 0
        if lazy:
            s = y + jnp.roll(y, -stride, axis=0)  # [0, 4q), valid at lo
            s = jnp.where(s >= two_q, s - two_q, s)  # [0, 2q)
            d = jnp.roll(y, stride, axis=0) + two_q - y  # [0, 4q), valid at hi
            w = mont_mul_lazy(d, tw, q, qi)  # [0, 2q)
        else:
            s = add_mod(y, jnp.roll(y, -stride, axis=0), q)
            d = sub_mod(jnp.roll(y, stride, axis=0), y, q)
            w = mont_mul(d, tw, q, qi)
        return jnp.where(is_lo, s, w)

    # lane stages first (ascending stride t = 1..64), transposed frame
    y = x.T  # [128, R]
    ci = _iota0(128, R)
    for s2 in range(6, -1, -1):
        y = stage(y, 128 >> (s2 + 1), lane_ref[0, s2], ci)
    x = y.T  # [R, 128]

    # row stages (ascending stride), then the final 1/N scaling
    ri = _iota0(R, 128)
    for g in range(srow - 1, -1, -1):
        x = stage(x, R >> (g + 1), twrow_ref[0, g], ri)
    # mont_mul tolerates lazy x (x*ninv < 2q*q < q*2^32) and returns [0, q)
    o_ref[0, 0] = mont_mul(x, ninv_ref[l, 0], q, qi)


def _call(x: jnp.ndarray, tabs: PallasNttTables, inverse: bool, interpret: bool):
    *lead, k, n = x.shape
    R = n // 128
    srow_dim = tabs.tw_row.shape[1]
    b = 1
    for d in lead:
        b *= d
    xr = x.reshape(b, k, R, 128)
    kernel = functools.partial(
        _inv_kernel if inverse else _fwd_kernel, tabs.lazy
    )
    specs = [
        pl.BlockSpec(memory_space=pltpu.SMEM),  # q [k,1], indexed by program_id
        pl.BlockSpec(memory_space=pltpu.SMEM),  # qi
        pl.BlockSpec((1, srow_dim, R, 1), lambda l, bb: (l, 0, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 7, 128, R), lambda l, bb: (l, 0, 0, 0), memory_space=pltpu.VMEM),
    ]
    args = [tabs.q, tabs.qi, tabs.tw_row, tabs.lane]
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
