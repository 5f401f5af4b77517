#!/usr/bin/env python
"""Ground-truth per-op breakdown of one keystream block: run it under
jax.profiler.trace and aggregate XLA op durations from the trace events.
Unlike slope microbenches, this measures the ops *in context* (real fusion,
real overlap, nothing dead-code-eliminated)."""

import glob
import gzip
import json
import os
import sys
import time
from collections import defaultdict

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax

from hhe_tpu.utils import cache as _cache

_cache.enable()


def main():
    import math

    from hhe_tpu.ops import bfv, helin, pasta, transcipher

    ctx = bfv.Context(bfv.BFVParams(n=16384, data_limbs=13, seed=1))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    elts = set(transcipher.galois_elts(ctx, True))
    elts.update(helin.flatten_galois_elts(ctx, math.ceil(784 / 128), 128))
    elts.update(helin.vec_sum_galois_elts(ctx))
    rk, gks = ctx.keygen_eval_keys_device(sk, sorted(elts), include_relin=True, seed=1)
    tc = transcipher.Transcipher(ctx, rk, gks)
    key = pasta.get_fixed_symmetric_key()
    enc_key = tc.encrypt_key(pk, key)
    mats_pt, rcs_pt = tc.device_block_plaintexts(pasta.NONCE, 0)
    out = tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, tc._keys())
    np.asarray(out[0, 0, :4])
    print(f"warm; device={jax.devices()[0]}", flush=True)

    tdir = "/tmp/jax_trace"
    os.system(f"rm -rf {tdir}")
    with jax.profiler.trace(tdir):
        for _ in range(3):
            out = tc._jit_keystream(enc_key.data, mats_pt, rcs_pt, tc._keys())
            np.asarray(out[0, 0, :4])

    # find the trace json (perfetto/chrome format)
    files = glob.glob(f"{tdir}/**/*.trace.json.gz", recursive=True)
    if not files:
        print("no trace found", glob.glob(f"{tdir}/**/*", recursive=True)[:20])
        return
    with gzip.open(files[0], "rt") as f:
        tr = json.load(f)
    events = tr["traceEvents"]
    # keep duration events from device lanes (XLA ops); bucket by fusion name
    per_op = defaultdict(float)
    total = 0.0
    pid_names = {
        e.get("pid"): e.get("args", {}).get("name", "")
        for e in events
        if e.get("ph") == "M" and e.get("name") == "process_name"
    }
    for e in events:
        if e.get("ph") != "X":
            continue
        pid = e.get("pid")
        pn = pid_names.get(pid, "")
        if "TPU" not in str(pn) and "/device" not in str(pn).lower():
            continue
        dur = e.get("dur", 0) / 1e3  # us -> ms
        name = e.get("name", "?")
        per_op[name] += dur
        total += dur
    print(f"total device op time over 3 blocks: {total:.1f} ms -> {total/3:.1f} ms/block")
    ranked = sorted(per_op.items(), key=lambda kv: -kv[1])
    for name, ms in ranked[:35]:
        print(f"{ms/3:9.2f} ms  {name[:110]}")


if __name__ == "__main__":
    main()
