"""Galois permutations as MXU one-hot matmuls (NTT evaluation domain).

Every hoisted-rotation permutation on the transcipher hot path is a fixed
NTT-domain index map ``out[s] = in[src[s]]`` (``bfv_eval.ntt_galois_src``),
and XLA lowers ``jnp.take`` of it to a serial gather measured at only
~2.7 Gelem/s on TPU v5e — the dominant cost of the BSGS matmul while the
Montgomery math idles (~26 Gelem/s).  This module replaces those gathers
with dense int8 matmuls on the 128x128 systolic array.

The trick: automorphisms x(X) -> x(X^g) are *affine* in natural NTT order,

    out_nat[j] = in_nat[(g*j + (g-1)/2) mod N]      (g odd)

so with N = 2^14 viewed as a [P=128, S=128] tile (flat index = p*128 + s,
both frames bit-reversed — the storage order of ``ntt.ntt_fwd`` output),
the bit-reversed source map factors exactly as

    src_br(p, q) = A1(p)*128 + G_p(q)

i.e. the *major* (sublane-tile) source index depends only on p, and for
each p the minor map G_p is a permutation of 0..127.  Proof sketch:
rev14(p*128+q) = rev7(q)*128 + rev7(p), so the affine map touches the
major digit only through ``g*rev7(q) + carry(p)`` and the minor digit only
through ``g*rev7(p) + c`` — the factorization below checks itself against
``ntt_galois_src`` element-by-element at build time.

Execution per permutation j:
  1. row shuffle: xr[p, :] = x[A1_j(p), :]      (whole-128-lane-row gather)
  2. one batched one-hot matmul per u8 digit:
     out[p, q] = sum_s xr[p, s] * E_j[p, s, q],  E one-hot int8.
     u32 operands split into four u8 digits, each fed as (d - 128) int8
     (so the one-hot row sum of 1 adds a constant +128 bias, removed after
     the int32 matmul) — bit-exact, no f32 rounding anywhere.

Cost: 4 digit-matmuls of [P=128 batch, M=rows, K=128, N=128] int8 on the
MXU + O(1) elementwise passes, vs a serial-gather pass per element.
Measured on TPU v5e (see tools/micro_galois.py): ~5-8x faster than
``jnp.take`` at the hot-path shapes.

No reference-code equivalent: SEAL applies automorphisms as host pointer
permutations (``seal/util/galois.h``); this lowering exists because the
TPU's gather unit is the bottleneck and its MXU is idle.
"""

from __future__ import annotations

from typing import NamedTuple, Sequence

import numpy as np
import jax
import jax.numpy as jnp

from . import bfv_eval


class PermSet(NamedTuple):
    """J precompiled NTT-domain permutations ready for MXU application.

    A pure array pytree (passable straight through a jit boundary as an
    argument — the transcipher ships it inside its key pytree).  Shapes for
    degree n: ``a1`` [J, n/128] int32 major-axis (row) source indices,
    ``e`` [J, n/128, 128, 128] int8 one-hot with e[j, p, s, q]."""

    a1: jnp.ndarray
    e: jnp.ndarray

    def rows(self, sl) -> "PermSet":
        """Sub-PermSet of a row slice (usable inside jit)."""
        return PermSet(self.a1[sl], self.e[sl])


def _factor_src(src: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Factor a bit-reversed-frame Galois source map into (A1[p], G[p, q])
    with src[p*128+q] = A1[p]*128 + G[p, q]; raises if not factorable."""
    n = src.shape[0]
    tile = 128
    p_cnt = n // tile
    s2 = src.reshape(p_cnt, tile)
    a1 = s2 // tile
    g = s2 % tile
    if not (a1 == a1[:, :1]).all():
        raise ValueError("source map major index is not row-separable")
    return a1[:, 0].astype(np.int64), g.astype(np.int64)


def build_perms(ctx, elts: Sequence[int]) -> PermSet:
    """Precompute the MXU form of ``ntt_galois_src`` for each element.

    Each permutation costs n*128 bytes of HBM (one-hot int8
    [n/128, 128, 128]): 2 MB at n=16384, 8 MB at n=65536 — the cost scales
    linearly with the degree, so the transcipher's full set (32 babysteps +
    3 giantsteps) is ~70 MB at the production degree but ~280 MB at the
    large preset.  Built once per Transcipher and shipped via its key
    pytree.
    """
    n = ctx.n
    if n % (128 * 128) != 0:
        raise ValueError(f"degree {n} not tileable as [*,128,128]")
    p_cnt = n // 128
    a1s, es = [], []
    for g in elts:
        src = bfv_eval.ntt_galois_src(ctx, g)
        a1, gmap = _factor_src(np.asarray(src))
        e = np.zeros((p_cnt, 128, 128), np.int8)
        p_idx = np.repeat(np.arange(p_cnt), 128)
        e[p_idx, gmap.ravel(), np.tile(np.arange(128), p_cnt)] = 1
        a1s.append(a1)
        es.append(e)
    return PermSet(
        a1=jnp.asarray(np.stack(a1s).astype(np.int32)),
        e=jnp.asarray(np.stack(es)),
    )


def _digits_pm128(x: jnp.ndarray) -> jnp.ndarray:
    """u32 [..., S] -> int8 [4, ..., S] of byte digits shifted by -128."""
    b0 = x & 0xFF
    b1 = (x >> 8) & 0xFF
    b2 = (x >> 16) & 0xFF
    b3 = x >> 24
    d = jnp.stack([b0, b1, b2, b3]).astype(jnp.int32) - 128
    return d.astype(jnp.int8)


def _recombine(r: jnp.ndarray) -> jnp.ndarray:
    """int32 digit results [4, ...] (range 0..255 after bias removal) -> u32."""
    u = (r + 128).astype(jnp.uint32)
    return u[0] | (u[1] << 8) | (u[2] << 16) | (u[3] << 24)


def _matmul_digits(xr: jnp.ndarray, e: jnp.ndarray) -> jnp.ndarray:
    """xr [J, R, P, S] u32, e [J, P, S, Q] int8 -> out [J, R, P, Q] u32
    with out[j, r, p, q] = xr[j, r, p, G_jp(q)] (exact)."""
    jdim, rdim, pdim, sdim = xr.shape
    d = _digits_pm128(xr)  # [4, J, R, P, S] int8
    d = jnp.transpose(d, (1, 3, 0, 2, 4)).reshape(jdim, pdim, 4 * rdim, sdim)
    out = jax.lax.dot_general(
        d,
        e,
        (((3,), (2,)), ((0, 1), (0, 1))),  # contract S; batch (J, P)
        preferred_element_type=jnp.int32,
    )  # [J, P, 4R, Q]
    out = out.reshape(jdim, pdim, 4, rdim, 128)
    out = jnp.transpose(out, (2, 0, 3, 1, 4))  # [4, J, R, P, Q]
    return _recombine(out)  # [J, R, P, Q]


def apply_broadcast(x: jnp.ndarray, ps: PermSet) -> jnp.ndarray:
    """All J permutations of ONE tensor: x [..., N] -> [J, ..., N] with
    out[j][..., s] = x[..., src_j[s]].  Bit-exact vs jnp.take."""
    n = x.shape[-1]
    batch = x.shape[:-1]
    r = int(np.prod(batch, dtype=np.int64)) if batch else 1
    xv = x.reshape(r, n // 128, 128)
    xr = jnp.take(xv, ps.a1, axis=1)  # [R, J, P, S] — whole-row gather
    xr = jnp.transpose(xr, (1, 0, 2, 3))  # [J, R, P, S]
    out = _matmul_digits(xr, ps.e)  # [J, R, P, Q]
    return out.reshape((ps.a1.shape[0],) + batch + (n,))


def apply_aligned(x: jnp.ndarray, ps: PermSet) -> jnp.ndarray:
    """Permutation j applied to slice j: x [J, ..., N] -> same shape with
    out[j][..., s] = x[j][..., src_j[s]]."""
    n = x.shape[-1]
    jdim = x.shape[0]
    batch = x.shape[1:-1]
    r = int(np.prod(batch, dtype=np.int64)) if batch else 1
    xv = x.reshape(jdim, r, n // 128, 128)
    xr = jnp.take_along_axis(xv, ps.a1[:, None, :, None], axis=2)  # [J,R,P,S]
    out = _matmul_digits(xr, ps.e)
    return out.reshape((jdim,) + batch + (n,))
