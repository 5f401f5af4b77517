"""Worker for the 2-process jax.distributed smoke test (run by
test_parallel.py::test_two_process_distributed_smoke).

Each process owns 2 virtual CPU devices; the pair forms a 4-device global
mesh via ``parallel.init_distributed`` (the multi-host bootstrap the
production CSP would use across hosts).  Exercises one cross-process psum
and one batch-sharded BFV multiply_plain, verifying the local shards
decrypt to the expected product.
"""

import os
import sys

pid, nproc, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = (
    os.environ.get("XLA_FLAGS", "") + " --xla_force_host_platform_device_count=2"
).strip()

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from functools import partial

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")

# bootstrap BEFORE anything touches a device: backend initialization pins
# the process-local device view, after which distributed init is a no-op
from hhe_tpu.parallel import mesh as hmesh

hmesh.init_distributed(f"localhost:{port}", nproc, pid)

import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from hhe_tpu.ops import bfv, bfv_eval
assert jax.process_count() == nproc, jax.process_count()
assert len(jax.devices()) == 2 * nproc  # global device view

mesh = hmesh.make_hhe_mesh(limb_shards=1)  # ("batch": 4, "limb": 1)

# --- 1. cross-process psum via shard_map over the batch axis
x = jax.make_array_from_process_local_data(
    NamedSharding(mesh, P(("batch", "limb"))),
    np.full(2, float(pid + 1), np.float32),  # proc 0: [1,1]; proc 1: [2,2]
)


@partial(
    jax.shard_map,
    mesh=mesh,
    in_specs=P(("batch", "limb")),
    out_specs=P(),
)
def global_sum(v):
    return jax.lax.psum(jnp.sum(v), ("batch", "limb"))


s = global_sum(x)
assert float(np.asarray(s.addressable_shards[0].data)) == 6.0, s

# --- 2. batch-sharded multiply_plain: each process contributes 2 samples
ctx = bfv.Context(bfv.BFVParams(n=1024, data_limbs=2, seed=0))
sk = ctx.keygen_secret()
pk = ctx.keygen_public(sk)
msg = np.arange(8, dtype=np.int64)
ct = ctx.encrypt(pk, ctx.encode(msg))
mult = np.zeros(ctx.n, np.int64)
mult[:8] = 3
pt_mul = ctx.plain_for_mul(ctx.encode(mult))

local = np.broadcast_to(
    np.asarray(ct.data)[:, None], (2, 2, ctx.k, ctx.n)
)  # this process's 2 samples
sh = hmesh.batch_sharding(mesh)  # P(None, "batch", "limb", None); limb=1
data = jax.make_array_from_process_local_data(sh, np.ascontiguousarray(local))

fn = jax.jit(
    lambda d, p: bfv_eval.multiply_plain(ctx, bfv.Ciphertext(d), p).data,
    out_shardings=sh,
)
out = fn(data, pt_mul)
local_out = np.asarray(out.addressable_shards[0].data)[:, 0]  # one local sample
got = ctx.decode(ctx.decrypt(sk, bfv.Ciphertext(local_out)))
assert np.array_equal(got[:8], (msg * 3) % ctx.t), got[:8]

print(f"worker {pid} OK", flush=True)
