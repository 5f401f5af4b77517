"""Fused Pallas key-switch contraction: bit-parity with the canonical XLA
math (interpret mode on CPU; the real kernel runs on TPU via
``transcipher._matmul_bsgs``)."""

import numpy as np
import jax.numpy as jnp
import pytest

from hhe_tpu.ops import kswitch_pallas, modular
from hhe_tpu.ops.modular import add_mod, mont_mul


def _ref_contract(fd_t, k0, k1, q, qi):
    kd = fd_t.shape[-2]
    t0 = mont_mul(fd_t[..., 0, :], k0[..., 0, :], q, qi)
    t1 = mont_mul(fd_t[..., 0, :], k1[..., 0, :], q, qi)
    for d in range(1, kd):
        t0 = add_mod(t0, mont_mul(fd_t[..., d, :], k0[..., d, :], q, qi), q)
        t1 = add_mod(t1, mont_mul(fd_t[..., d, :], k1[..., d, :], q, qi), q)
    return t0, t1


@pytest.mark.parametrize("pair", [False, True], ids=["bcast", "pair"])
def test_contract_parity_interpret(pair):
    rng = np.random.default_rng(0)
    J, kp, kd, n = 4, 3, 2, 256
    moduli = [(1 << 30) - 35, (1 << 30) - 227, (1 << 29) - 3]
    q = jnp.asarray(np.array(moduli, np.uint32).reshape(kp, 1))
    qi = jnp.asarray(
        np.array(
            [modular.mont_constants(m)[0] for m in moduli], np.uint32
        ).reshape(kp, 1)
    )

    def u32(shape):
        return jnp.asarray(
            (rng.integers(0, 1 << 29, shape, np.int64)).astype(np.uint32)
        )

    k0 = u32((J, kp, kd, n))
    k1 = u32((J, kp, kd, n))
    if pair:
        fd = u32((J, kp, kd, n))
        got = kswitch_pallas.contract_pair(fd, k0, k1, q, qi, interpret=True)
    else:
        fd = u32((kp, kd, n))
        got = kswitch_pallas.contract_bcast(fd, k0, k1, q, qi, interpret=True)
    want = _ref_contract(fd if pair else fd[None], k0, k1, q, qi)
    assert np.array_equal(np.asarray(got[0]), np.asarray(want[0]))
    assert np.array_equal(np.asarray(got[1]), np.asarray(want[1]))
