#!/usr/bin/env python
"""jnp.take vs galois_mxu one-hot matmuls at the BSGS hot-path shapes.

Slope method (chain R reps inside one jit) so the ~85 ms tunnel sync and
dispatch overhead cancel.
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()
import jax.numpy as jnp

from hhe_tpu.ops import bfv, bfv_eval, galois_mxu


def slope(fn, x, r_lo=2, r_hi=10, reps=3):
    def chain(r):
        def body(_, v):
            out = fn(v)
            # keep shape: fold J axis back if broadcast added one
            return out[0] if out.ndim == v.ndim + 1 else out

        return jax.jit(lambda v: jax.lax.fori_loop(0, r, body, v))

    flo, fhi = chain(r_lo), chain(r_hi)
    np.asarray(flo(x)).ravel()[:2]
    np.asarray(fhi(x)).ravel()[:2]

    def best(f):
        ts = []
        for _ in range(reps):
            t0 = time.perf_counter()
            np.asarray(f(x)).ravel()[:2]
            ts.append(time.perf_counter() - t0)
        return min(ts)

    return (best(fhi) - best(flo)) / (r_hi - r_lo)


def main():
    n = 16384
    ctx = bfv.Context(bfv.BFVParams(n=n, data_limbs=13, seed=3))
    elts = [ctx.galois_elt_from_step(-j) for j in range(1, 32)]
    ps = galois_mxu.build_perms(ctx, elts)
    srcs = jnp.asarray(
        np.stack([bfv_eval.ntt_galois_src(ctx, g) for g in elts])
    )
    rng = np.random.default_rng(0)
    print(f"device={jax.devices()[0]}", flush=True)

    # shape A: h0-style aligned perms [31, 14, N]
    xa = jnp.asarray(
        rng.integers(0, 1 << 32, (31, 14, n), dtype=np.uint64).astype(np.uint32)
    )
    take_al = lambda v: jax.vmap(lambda b, s: jnp.take(b, s, axis=-1))(v, srcs)
    mxu_al = lambda v: galois_mxu.apply_aligned(v, ps)
    # exactness on device
    assert np.array_equal(np.asarray(jax.jit(take_al)(xa)), np.asarray(jax.jit(mxu_al)(xa)))
    t_take = slope(take_al, xa)
    t_mxu = slope(mxu_al, xa)
    print(f"aligned [31,14,N]: take {t_take*1e3:7.3f} ms   mxu {t_mxu*1e3:7.3f} ms   ({t_take/t_mxu:.2f}x)", flush=True)

    # shape B: rot_f0-style broadcast perms [13, N] -> [31, 13, N]
    xb = jnp.asarray(
        rng.integers(0, 1 << 32, (13, n), dtype=np.uint64).astype(np.uint32)
    )
    take_br = lambda v: jax.vmap(lambda s: jnp.take(v, s, axis=-1))(srcs)
    mxu_br = lambda v: galois_mxu.apply_broadcast(v, ps)
    assert np.array_equal(np.asarray(jax.jit(take_br)(xb)), np.asarray(jax.jit(mxu_br)(xb)))

    def slope_br(fn, x):
        # broadcast changes shape; chain by feeding row 0 back in
        def chain(r):
            def body(_, v):
                return fn(v)[0]

            return jax.jit(lambda v: jax.lax.fori_loop(0, r, body, v))

        flo, fhi = chain(2), chain(10)
        np.asarray(flo(x)).ravel()[:2]
        np.asarray(fhi(x)).ravel()[:2]

        def best(f):
            ts = []
            for _ in range(3):
                t0 = time.perf_counter()
                np.asarray(f(x)).ravel()[:2]
                ts.append(time.perf_counter() - t0)
            return min(ts)

        return (best(fhi) - best(flo)) / 8

    t_take = slope_br(take_br, xb)
    t_mxu = slope_br(mxu_br, xb)
    print(f"broadcast [13,N]x31: take {t_take*1e3:7.3f} ms   mxu {t_mxu*1e3:7.3f} ms   ({t_take/t_mxu:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
