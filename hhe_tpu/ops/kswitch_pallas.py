"""Fused Pallas key-switch contraction — the transcipher's hottest math.

The hybrid key-switch inner product (reference SEAL ``evaluator.h``
switch_key_inplace; here ``bfv_eval.hoisted_ks_products``) computes, for J
rotations sharing one hoisted digit decomposition,

    a[j, i, :] = sum_d  fd[d, i, :] * key[j, d, i, :]   (mod qp_i)

As XLA ops this materializes a [J, kd, kp, N] product tensor through HBM
for every multiply-accumulate step (~6x the irreducible traffic).  This
kernel keeps the accumulator in VMEM and streams each key block exactly
once; the shared ``fd`` block is fetched once per modulus because the
innermost grid dimension (j) leaves its block index unchanged (Mosaic skips
the re-copy).  Irreducible traffic = keys (once) + fd (once) + outputs.

Layouts: moduli-major, digit-minor — fd [kp, kd, N], keys [J, kp, kd, N] —
so a block is one modulus' [kd, N] plane (VMEM ~0.9 MB at production N).
Keys are static per Transcipher; they are transposed into this layout once
at setup.  Outputs are bit-identical to the XLA path (same Montgomery math).
"""

from __future__ import annotations

import os
from typing import Tuple

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .modular import add_mod, mont_mul

_ENABLED = os.environ.get("HHE_KS_PALLAS", "1") != "0"


def available() -> bool:
    """Dispatch gate: the fused kernel runs on TPU (XLA path is canonical)."""
    if not _ENABLED:
        return False
    try:
        return jax.default_backend() == "tpu"
    except Exception:  # pragma: no cover
        return False


def _accumulate(fd, k0, k1, q, qi, o0_ref, o1_ref):
    kd, n = fd.shape
    r = n // 128
    a0 = mont_mul(fd[0], k0[0], q, qi)
    a1 = mont_mul(fd[0], k1[0], q, qi)
    for d in range(1, kd):
        a0 = add_mod(a0, mont_mul(fd[d], k0[d], q, qi), q)
        a1 = add_mod(a1, mont_mul(fd[d], k1[d], q, qi), q)
    o0_ref[0, 0] = a0.reshape(r, 128)
    o1_ref[0, 0] = a1.reshape(r, 128)


def _kernel_bcast(q_ref, qi_ref, fd_ref, k0_ref, k1_ref, o0_ref, o1_ref):
    i = pl.program_id(0)
    _accumulate(
        fd_ref[0], k0_ref[0, 0], k1_ref[0, 0], q_ref[i, 0], qi_ref[i, 0],
        o0_ref, o1_ref,
    )


def _kernel_pair(q_ref, qi_ref, fd_ref, k0_ref, k1_ref, o0_ref, o1_ref):
    i = pl.program_id(0)
    _accumulate(
        fd_ref[0, 0], k0_ref[0, 0], k1_ref[0, 0], q_ref[i, 0], qi_ref[i, 0],
        o0_ref, o1_ref,
    )


def _call(kernel, fd, fd_spec, k0, k1, q, qi, interpret):
    J, kp, kd, n = k0.shape
    r = n // 128
    key_spec = pl.BlockSpec(
        (1, 1, kd, n), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, r, 128), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    o0, o1 = pl.pallas_call(
        kernel,
        grid=(kp, J),  # j innermost: the bcast fd block is reused across j
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.SMEM),
            fd_spec,
            key_spec,
            key_spec,
        ],
        out_specs=[out_spec, out_spec],
        out_shape=[
            jax.ShapeDtypeStruct((J, kp, r, 128), jnp.uint32),
            jax.ShapeDtypeStruct((J, kp, r, 128), jnp.uint32),
        ],
        interpret=interpret,
    )(q, qi, fd, k0, k1)
    return o0.reshape(J, kp, n), o1.reshape(J, kp, n)


def contract_bcast(
    fd: jnp.ndarray,
    k0: jnp.ndarray,
    k1: jnp.ndarray,
    q: jnp.ndarray,
    qi: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """One digit set against J key sets (hoisting fan-out).

    fd [kp, kd, N] NTT std; k0/k1 [J, kp, kd, N] NTT Mont;
    q/qi [kp, 1] SMEM scalars.  Returns (a0, a1) [J, kp, N].
    """
    kp, kd, n = fd.shape
    fd_spec = pl.BlockSpec(
        (1, kd, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM
    )
    return _call(_kernel_bcast, fd, fd_spec, k0, k1, q, qi, interpret)


def contract_pair(
    fd: jnp.ndarray,
    k0: jnp.ndarray,
    k1: jnp.ndarray,
    q: jnp.ndarray,
    qi: jnp.ndarray,
    interpret: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """J digit sets against J key sets, elementwise in j.

    fd [J, kp, kd, N]; k0/k1 [J, kp, kd, N].  Returns (a0, a1) [J, kp, N].
    """
    J, kp, kd, n = fd.shape
    fd_spec = pl.BlockSpec(
        (1, 1, kd, n), lambda i, j: (j, i, 0, 0), memory_space=pltpu.VMEM
    )
    return _call(_kernel_pair, fd, fd_spec, k0, k1, q, qi, interpret)
