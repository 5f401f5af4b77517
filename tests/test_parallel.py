"""Mesh-sharded evaluation on the 8-device virtual CPU mesh: sharded results
must equal unsharded results exactly (integer arithmetic — bit-exact)."""

import os

import numpy as np
import pytest
import jax
import jax.numpy as jnp

from hhe_tpu.ops import bfv, bfv_eval, helin
from hhe_tpu.parallel import mesh as hmesh


@pytest.fixture(scope="module")
def stack():
    ctx = bfv.Context(bfv.BFVParams(n=2048, data_limbs=4, seed=33))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    rk = ctx.keygen_relin(sk)
    gks = ctx.keygen_galois(sk, [ctx.galois_elt_from_step(1)])
    return ctx, sk, pk, rk, gks


def test_mesh_shapes():
    m = hmesh.make_hhe_mesh(8, limb_shards=2)
    assert m.shape == {"batch": 4, "limb": 2}


def test_sharded_batch_eval_matches_unsharded(stack):
    """multiply_plain + rotate + add on a sharded ciphertext batch == the
    same ops unsharded (dp over samples, tp over limbs)."""
    ctx, sk, pk, rk, gks = stack
    assert len(jax.devices()) == 8
    m = hmesh.make_hhe_mesh(8, limb_shards=2)  # k=4 divides 2
    rng = np.random.default_rng(0)
    B = 8
    vals = rng.integers(0, ctx.t, (B, ctx.n), dtype=np.int64)
    cts = [ctx.encrypt(pk, ctx.encode(v)) for v in vals]
    batch = bfv.Ciphertext(jnp.stack([c.data for c in cts], axis=1))  # [2,B,k,N]
    w = rng.integers(0, ctx.t, ctx.n, dtype=np.int64)
    wpt = ctx.plain_for_mul(ctx.encode(w))
    g = ctx.galois_elt_from_step(1)

    def pipeline(ct):
        prod = bfv_eval.multiply_plain(ctx, ct, wpt)
        rot = bfv_eval.apply_galois(ctx, prod, g, gks[g])
        return bfv_eval.add(ctx, prod, rot)

    plain_out = pipeline(batch)

    sharded = hmesh.shard_ciphertext_batch(batch, m)
    sharded_out = jax.jit(pipeline)(sharded)

    assert np.array_equal(np.asarray(plain_out.data), np.asarray(sharded_out.data))
    # decrypt one sample to anchor semantics
    one = bfv.Ciphertext(np.asarray(sharded_out.data)[:, 3])
    dec = ctx.decode(ctx.decrypt(sk, one))
    prod = vals[3] * w % ctx.t
    half = ctx.n // 2
    rot = np.roll(prod.reshape(2, half), -1, axis=1).reshape(-1)
    assert np.array_equal(dec, (prod + rot) % ctx.t)


def test_pad_batch():
    x = np.arange(10).reshape(5, 2)
    p, n = hmesh.pad_batch(x, 4)
    assert p.shape == (8, 2) and n == 5


def test_sharded_transcipher_hot_path_bitexact():
    """THE hot path — one full transcipher round (hoisted BSGS matmul =
    key-switch digit decomposition + contractions + galois permutes +
    mod-down, add_plain, mix, feistel sbox/relin), the batched finish, and
    the encrypted FC eval (ct x ct multiply + relin + rotate-reduce) — run
    under the ("batch", "limb") mesh: the encrypted PASTA key is
    limb-sharded through the round, the sample batch is batch-sharded
    through finish + FC.  Results must be bit-identical to the unsharded
    run (the reference's per-record sequential loop, CSP.cpp:247-252,
    parallelized — SURVEY §2.4 item 2).

    One round exercises every sharded op class of the full 4-round
    keystream at ~1/4 the graph (and 6 limbs instead of the 14 a
    noise-budget-complete keystream needs — bit-exactness of the integer
    tensor ops does not depend on noise headroom); the full-depth
    decompose parity vs plaintext PASTA is covered unsharded in
    test_transcipher.py."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hhe_tpu.ops import bfv_eval, pasta
    from hhe_tpu.workloads import hhe_inference as wk

    mesh = hmesh.make_hhe_mesh(8, limb_shards=2)
    stack = wk.build_stack(
        bfv.BFVParams(n=1024, data_limbs=6, seed=5), input_len=128
    )
    ctx, tc = stack.ctx, stack.tc
    rng = np.random.default_rng(2)
    B, L = 8, 128
    x = rng.integers(0, 64, (B, L)).astype(np.uint64)
    w = rng.integers(-3, 4, L)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(stack.pk, key)
    weight_ct = helin.encrypt_weight(ctx, stack.pk, w[None, :])[0]
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)

    def one_round(key_data, mats, rcs, keys):
        st = bfv.Ciphertext(key_data)
        st = tc._matmul(st, tc.round_mats(mats, 0), keys)
        st = bfv_eval.add_plain(ctx, st, rcs[0])
        st = tc._mix(st, keys)
        return tc._sbox_feistel(st, keys).data

    f = jax.jit(one_round)
    ks_plain = f(enc_key.data, mats_pt, rcs_pt, tc._keys())
    chunk = jnp.asarray(x.astype(np.uint32))
    fin_plain = tc._jit_finish(ks_plain, chunk)  # [2, B, k, N]
    wct = bfv.Ciphertext(weight_ct.data[:, None])
    out_plain = wk.csp_eval_1fc(stack, bfv.Ciphertext(fin_plain), wct, do_sum=True)

    # sharded run: limb-sharded round, batch-sharded finish + FC eval
    enc_key_sh = jax.device_put(
        enc_key.data, NamedSharding(mesh, P(None, "limb", None))
    )
    ks_sh = f(enc_key_sh, mats_pt, rcs_pt, tc._keys())
    chunk_sh = jax.device_put(chunk, NamedSharding(mesh, P("batch", None)))
    fin_sh = tc._jit_finish(ks_sh, chunk_sh)
    ct_sh = hmesh.shard_ciphertext_batch(bfv.Ciphertext(fin_sh), mesh)
    out_sh = wk.csp_eval_1fc(stack, ct_sh, wct, do_sum=True)

    assert np.array_equal(np.asarray(ks_plain), np.asarray(ks_sh))
    assert np.array_equal(np.asarray(out_plain.data), np.asarray(out_sh.data))


@pytest.mark.slow
def test_sharded_full_decompose_decrypt_parity():
    """Full-depth sharded end-to-end (advisor round-4: the fast one-round
    test above must not be the ONLY sharded coverage): the complete 4-round
    csp_decompose at a noise-complete 14-limb chain, keystream limb-sharded
    and finish batch-sharded over the ("batch", "limb") mesh, must be
    bit-identical to the unsharded run AND decrypt back to the plaintext
    samples (the reference parity contract, hhe_pktnn_examples.cpp:638-648)."""
    from jax.sharding import NamedSharding, PartitionSpec as P

    from hhe_tpu.ops import pasta
    from hhe_tpu.workloads import hhe_inference as wk

    mesh = hmesh.make_hhe_mesh(8, limb_shards=2)
    stack = wk.build_stack(
        bfv.BFVParams(n=2048, data_limbs=14, seed=6), input_len=128
    )
    ctx, tc = stack.ctx, stack.tc
    rng = np.random.default_rng(9)
    B, L = 8, 128
    x = rng.integers(0, ctx.t, (B, L)).astype(np.uint64)
    key = pasta.get_fixed_symmetric_key()
    cipher = pasta.Pasta(key, ctx.t)
    sym = cipher.encrypt(x)
    enc_key = tc.encrypt_key(stack.pk, key)

    data_plain = wk.csp_decompose(stack, enc_key, sym)

    tc.clear_caches()  # force the sharded run to re-evaluate the keystream
    enc_key_sh = bfv.Ciphertext(
        jax.device_put(enc_key.data, NamedSharding(mesh, P(None, "limb", None)))
    )
    data_sh = wk.csp_decompose(stack, enc_key_sh, sym, mesh=mesh)

    assert np.array_equal(np.asarray(data_plain.data), np.asarray(data_sh.data))
    # decrypt parity vs the plaintext inputs, via the batched decrypt
    slots = ctx.decode_batch(ctx.decrypt_batch(stack.sk, data_sh))
    assert np.array_equal(slots[:, :L], x)


def test_sharded_ntt_poly_axis():
    """Four-step NTT with the polynomial coefficient axis sharded over an
    8-device `poly` mesh axis (all_to_all transposes on the ICI): roundtrip
    and full negacyclic product are exact vs the host model — including the
    reference's large-degree preset N=65536 (SEAL_Cipher.cpp:47-61)."""
    import jax

    from hhe_tpu.ops import ntt, primes
    from hhe_tpu.parallel import ntt_shard

    mesh = jax.make_mesh((8,), ("poly",))
    for n in (4096, 65536):
        mods = primes.ntt_primes(n, 30, 2)
        sn = ntt_shard.ShardedNtt(mods, n, mesh)
        rng = np.random.default_rng(0)
        a = np.stack([rng.integers(0, q, n) for q in mods]).astype(np.uint32)
        b = np.stack([rng.integers(0, q, n) for q in mods]).astype(np.uint32)
        rt = np.asarray(sn.inv(sn.fwd(sn.shard(a))))
        assert np.array_equal(rt, a)
        got = np.asarray(sn.negacyclic_mul(a, b)).astype(np.uint64)
        want = np.stack(
            [
                ntt.poly_mul_host(
                    a[i].astype(np.uint64), b[i].astype(np.uint64), int(q)
                )
                for i, q in enumerate(mods)
            ]
        )
        assert np.array_equal(got, want)


def test_two_process_distributed_smoke():
    """parallel.init_distributed executed for real: two OS processes form a
    4-device global CPU mesh via jax.distributed, run one cross-process psum
    and one batch-sharded multiply_plain each (tests/distributed_worker.py).
    This is the multi-host bootstrap path the CSP pod would use across hosts
    (DCN); single-process virtual-mesh tests cannot reach it."""
    import socket
    import subprocess
    import sys

    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    worker = os.path.join(os.path.dirname(__file__), "distributed_worker.py")
    env = {k: v for k, v in os.environ.items() if k not in ("XLA_FLAGS",)}
    procs = [
        subprocess.Popen(
            [sys.executable, worker, str(pid), "2", str(port)],
            stdout=subprocess.PIPE,
            stderr=subprocess.STDOUT,
            text=True,
            env=env,
        )
        for pid in range(2)
    ]
    outs = []
    try:
        for p in procs:
            out, _ = p.communicate(timeout=240)
            outs.append(out)
    finally:
        for p in procs:
            if p.poll() is None:
                p.kill()
    for pid, (p, out) in enumerate(zip(procs, outs)):
        assert p.returncode == 0, f"worker {pid} failed:\n{out[-2000:]}"
        assert f"worker {pid} OK" in out
