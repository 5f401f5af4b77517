"""Single-process HHE protocol simulations — end-to-end encrypted inference.

TPU-native equivalent of the reference's workload layer
(``src/examples/hhe_pktnn_examples.{h,cpp}``): the three parties (Analyst,
Client/User, CSP) simulated in one process, matching the reference pipelines:

- ``ecg_inference``   — per-sample 1-block transcipher + encrypted weight
  product; the analyst decrypts, sums slots host-side, applies
  ``simple_pocket_sigmoid`` and thresholds at 64
  (reference ``hhe_pktnn_examples.cpp:63-383``).
- ``fc1_inference``   — long inputs (e.g. SpO2 300): transcipher + mask +
  flatten + encrypted product + encrypted rotate-reduce sum; the analyst
  reads slot inputLen-1 and applies ``int_sigmoid``
  (reference ``hhe_pktnn_examples.cpp:385-711``), with the plaintext-parity
  hard check.

TPU-first: samples are batched through the transcipher (keystream reuse +
batched negate/add), and the encrypted FC product+reduce runs on the whole
batch at once.
"""

from __future__ import annotations

import dataclasses
import math
from typing import Dict, List, Optional, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from ..models import pocketnn
from ..ops import bfv, bfv_eval, helin, pasta, transcipher
from ..ops.bfv import BFVParams, Ciphertext, Context
from ..utils import checks, metrics
from ..utils.config import Config, RunConfig


def _apply_run(samples, labels, run: Optional[RunConfig]):
    """Reference dry_run semantics (``configs/config.cpp:11-12``): cap the
    sample count; debugging handled at the call sites."""
    if run is None:
        return samples, labels
    lim = run.sample_limit(len(samples))
    return samples[:lim], (None if labels is None else np.asarray(labels).reshape(-1)[:lim])


def _debug_noise(stack: "HHEStack", ct: Ciphertext, tag: str, run: Optional[RunConfig]):
    """Per-stage noise telemetry when run.debugging (reference
    ``pasta_3_seal.cpp:73`` print_noise in the debug path)."""
    if run is None or not run.debugging:
        return
    first = _split_batch(ct)[0]
    print(f"[debug] noise budget after {tag}: "
          f"{stack.ctx.noise_budget(stack.sk, first)} bits", flush=True)


@dataclasses.dataclass
class HHEStack:
    """Bundled parameter set + party keys for single-process simulations."""

    ctx: Context
    sk: bfv.SecretKey
    pk: bfv.PublicKey
    rk: bfv.KSwitchKey
    gks: Dict[int, bfv.KSwitchKey]
    tc: transcipher.Transcipher
    # The CSP's own secret key — distinct from the analyst's by protocol
    # (reference CSP.cpp:220-230; checked at build time like
    # hhe_pktnn_examples.cpp:811). Never used to decrypt analyst data.
    csp_sk: Optional[bfv.SecretKey] = None


def build_stack(
    params: Optional[BFVParams] = None,
    input_len: int = 300,
    device_keygen: bool = False,
    seed: int = 0,
    config: Optional["Config"] = None,
) -> HHEStack:
    """Analyst-side setup: context + all keys the protocol needs (reference
    Analyst::generateHEKeys, Analyst.cpp:70-94,234-249).

    device_keygen generates the evaluation keys (relin + galois) on device
    via the JAX PRNG — minutes faster than host keygen at production N and
    nothing GB-scale crosses the host->device tunnel.

    config (utils.config.Config) supplies the HE parameters and BSGS layout
    when given (the reference's compiled-in config.cpp equivalent)."""
    use_bsgs, n1, n2 = True, transcipher.BSGS_N1, transcipher.BSGS_N2
    if config is not None:
        params = params or config.he.to_bfv_params(seed)
        use_bsgs, n1, n2 = config.he.use_bsgs, config.he.bsgs_n1, config.he.bsgs_n2
    ctx = Context(params or BFVParams())
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    num_blocks = math.ceil(input_len / transcipher.T)
    elts = set(transcipher.galois_elts(ctx, use_bsgs, n1, n2))
    elts.update(helin.flatten_galois_elts(ctx, num_blocks, transcipher.T))
    elts.update(helin.vec_sum_galois_elts(ctx))
    if device_keygen:
        rk, gks = ctx.keygen_eval_keys_device(
            sk, sorted(elts), include_relin=True, seed=seed
        )
    else:
        rk = ctx.keygen_relin(sk)
        gks = ctx.keygen_galois(sk, sorted(elts))
    tc = transcipher.Transcipher(ctx, rk, gks, use_bsgs=use_bsgs, n1=n1, n2=n2)
    # CSP key hygiene: the CSP's own keypair must differ from the analyst's
    # (reference protocol check checks.h:58-71, used hhe_pktnn_examples.cpp:811)
    csp_sk = ctx.keygen_secret()
    checks.are_same_he_sk(sk, csp_sk)
    return HHEStack(ctx, sk, pk, rk, gks, tc, csp_sk=csp_sk)


# ---------------------------------------------------------------------------
# CSP-side pipeline
# ---------------------------------------------------------------------------


def csp_decompose(
    stack: HHEStack,
    enc_key: Ciphertext,
    sym_data: np.ndarray,
    nonce: int = pasta.NONCE,
    mesh=None,
) -> Ciphertext:
    """Transcipher + postprocess (mask tail, flatten) for a batch [B, L]
    (reference CSP::decompose, CSP.cpp:235-283). Returns batched ct
    [2, B, k, N] holding each sample in slots [0, L).

    With ``mesh`` the sample batch is sharded over the mesh batch axis."""
    ctx = stack.ctx
    sym_data = np.atleast_2d(np.asarray(sym_data, np.uint64))
    L = sym_data.shape[1]
    blocks = stack.tc.decompose(enc_key, sym_data, nonce=nonce, mesh=mesh)
    tail = L % transcipher.T
    if tail != 0:
        blocks[-1] = helin.mask(ctx, blocks[-1], helin.make_mask(ctx, tail))
    if len(blocks) == 1:
        return blocks[0]
    return helin.flatten(ctx, blocks, stack.gks, transcipher.T)


def csp_eval_1fc(
    stack: HHEStack, data_ct: Ciphertext, weight_ct: Ciphertext, do_sum: bool
) -> Ciphertext:
    """Encrypted FC: data * weight (ct x ct), relinearize, optional
    rotate-reduce sum (reference CSP_hhe_pktnn_1fc::evaluateModel,
    CSP.cpp:288-323; log-depth sum replaces the naive 299-rotation loop).

    Jitted into one device dispatch per (shape, do_sum) — the eager
    composition cost ~30 per-op dispatches through the TPU tunnel."""
    import jax

    key = f"_jit_1fc_{do_sum}"
    if stack.__dict__.get(key) is None:
        ctx = stack.ctx

        def fc_fn(dd, wd, rk, gks):
            prod = bfv_eval.relinearize(
                ctx, bfv_eval.multiply(ctx, Ciphertext(dd), Ciphertext(wd)), rk
            )
            if do_sum:
                prod = helin.encrypted_vec_sum_log(ctx, prod, gks)
            return prod.data

        stack.__dict__[key] = jax.jit(fc_fn)
    return Ciphertext(
        stack.__dict__[key](data_ct.data, weight_ct.data, stack.rk, stack.gks)
    )


# ---------------------------------------------------------------------------
# Analyst-side decryption
# ---------------------------------------------------------------------------


def _split_batch(ct: Ciphertext) -> List[Ciphertext]:
    data = np.asarray(ct.data)
    if data.ndim == 3:
        return [Ciphertext(jnp.asarray(data))]
    return [Ciphertext(jnp.asarray(data[:, i])) for i in range(data.shape[1])]


def _decrypt_signed_slots(stack: HHEStack, result_ct: Ciphertext) -> np.ndarray:
    """Decrypt a (possibly batched) result ct to [B, N] signed slot values.

    Full-level batched cts take the vectorized path
    (``Context.decrypt_batch``: one device program + exact u64 fixed-point
    scale-and-round — at dataset scale the reference's per-sample decrypt
    loop is the analyst-side bottleneck); anything else falls back to the
    per-sample host decrypt.  Bit-identical either way (tested)."""
    ctx = stack.ctx
    data = np.asarray(result_ct.data)
    if data.ndim == 4 and data.shape[2] == ctx.k:
        m = ctx.decrypt_batch(stack.sk, Ciphertext(jnp.asarray(data)))
        return ctx.decode_signed_batch(m)
    return np.stack(
        [
            ctx.decode_signed(ctx.decrypt(stack.sk, ct))
            for ct in _split_batch(result_ct)
        ]
    )


def analyst_decrypt_sum_sigmoid(
    stack: HHEStack, result_ct: Ciphertext, length: int
) -> np.ndarray:
    """ECG pipeline: decrypt, host-sum `length` slots, simple_pocket_sigmoid,
    threshold > 64 -> prediction in {0, 128} (hhe_pktnn_examples.cpp:305-335)."""
    slots = _decrypt_signed_slots(stack, result_ct)[:, :length]
    out = np.asarray(pocketnn.simple_pocket_sigmoid(slots.sum(1)))
    return np.where(out > 64, 128, 0)


def analyst_decrypt_slot_sigmoid(
    stack: HHEStack, result_ct: Ciphertext, input_len: int
) -> Tuple[np.ndarray, np.ndarray]:
    """SpO2/1fc pipeline: decrypt, read slot input_len-1, int_sigmoid
    (reference Analyst::decryptData, Analyst.cpp:352-381).
    Returns (raw fc outputs, predictions)."""
    raw = _decrypt_signed_slots(stack, result_ct)[:, input_len - 1]
    preds = np.asarray([int(pocketnn.int_sigmoid(int(v))) for v in raw])
    return raw.astype(np.int64), preds


# ---------------------------------------------------------------------------
# Full protocol simulations
# ---------------------------------------------------------------------------


def hhe_1fc_inference(
    stack: HHEStack,
    weight: np.ndarray,
    samples: np.ndarray,
    check_parity: bool = True,
    run: Optional[RunConfig] = None,
) -> Dict[str, np.ndarray]:
    """Full SpO2-style pipeline on a batch: PASTA encrypt -> transcipher ->
    mask/flatten -> encrypted FC + sum -> decrypt slot -> int_sigmoid.

    weight: [L] or [L, 1] signed ints; samples: [B, L] uint.
    With check_parity, raises if HHE output != plaintext w . x
    (the reference's hard failure, hhe_pktnn_examples.cpp:692-699)."""
    ctx = stack.ctx
    w = np.asarray(weight, np.int64).reshape(-1)
    samples = np.atleast_2d(np.asarray(samples, np.uint64))
    samples, _ = _apply_run(samples, None, run)
    B, L = samples.shape
    assert w.shape == (L,)
    timer, ledger = metrics.Timer(), metrics.CommLedger()

    # User: symmetric encryption + HE key encryption
    key = pasta.get_fixed_symmetric_key()
    cipher = pasta.Pasta(key, ctx.t)
    with timer.phase("user"):
        sym = cipher.encrypt(samples)
        enc_key = stack.tc.encrypt_key(stack.pk, key)
    ledger.add("analyst-user", metrics.he_pk_size(stack.pk))
    ledger.add(
        "user-csp",
        metrics.he_vec_size([enc_key]) + metrics.sym_enc_data_size(sym),
    )

    # Analyst: model encryption (transposed row -> one ct)
    with timer.phase("analyst"):
        weight_ct = helin.encrypt_weight(ctx, stack.pk, w[None, :])[0]
    ledger.add(
        "analyst-csp",
        metrics.he_key_size(stack.rk, stack.gks) + metrics.he_vec_size([weight_ct]),
    )

    # CSP: transcipher + evaluate
    with timer.phase("csp"):
        data_ct = csp_decompose(stack, enc_key, sym)
        _debug_noise(stack, data_ct, "decomposition+flatten", run)
        wct = Ciphertext(
            weight_ct.data[:, None] if np.asarray(data_ct.data).ndim == 4 else weight_ct.data
        )
        result = csp_eval_1fc(stack, data_ct, wct, do_sum=True)
    _debug_noise(stack, result, "encrypted FC + vec_sum", run)
    ledger.add("analyst-csp", metrics.he_vec_size(_split_batch(result)))

    # Analyst: decrypt
    with timer.phase("analyst"):
        raw, preds = analyst_decrypt_slot_sigmoid(stack, result, L)

    if check_parity:
        expect = (samples.astype(np.int64) @ w).astype(np.int64)
        if not np.array_equal(raw, expect):
            raise RuntimeError(
                "FC layer's plaintext results and HHE results are different: "
                f"{raw} vs {expect}"
            )
    report = metrics.experiment_report(timer, ledger)
    if run is not None and run.verbose:
        print(metrics.format_experiment_report(report), flush=True)
    return {"raw": raw, "predictions": preds, "report": report}


def _fc2_scalar_consts(ctx: Context, w2: np.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Montgomery |w2| per limb + sign mask for the small-norm fc2."""
    from ..ops import modular

    w2 = np.asarray(w2, np.int64)
    R, C = w2.shape
    k = ctx.k
    mont = np.zeros((R, C, k, 1), np.uint32)
    for i, q in enumerate(ctx.q_moduli):
        for r in range(R):
            for c in range(C):
                mont[r, c, i, 0] = modular.to_mont_host(
                    np.uint64(abs(int(w2[r, c])) % int(q)), int(q)
                )
    return jnp.asarray(mont), jnp.asarray((w2 < 0)[:, :, None, None])


def _jit_2fc_chunk(stack: HHEStack, digit_chunk: Optional[int] = None):
    """One jitted program for a (data x weight-chunk) 2FC pass: BEHZ
    multiply + relinearize + log-depth vec-sum + square + the small-norm
    fc2 partial, all in a single device dispatch.  The previous eager
    composition issued hundreds of per-op dispatches through the TPU
    tunnel (measured: minutes per batch at production N).

    digit_chunk bounds the relinearize hoist temporaries (bit-identical;
    see bfv_eval.keyswitch) so larger sample batches fit HBM."""
    import jax

    jkey = f"_jit_2fc_chunk_{digit_chunk}"
    if stack.__dict__.get(jkey) is None:
        ctx = stack.ctx

        def chunk_fn(dd, wstack, w2_mont, w2_neg, rk, gks):
            from ..ops.modular import mont_mul, neg_mod, tree_add_mod

            a = Ciphertext(dd[:, :, None])  # [2, B, 1, k, N]
            b = Ciphertext(wstack[:, None])  # [2, 1, R, k, N]
            prod = bfv_eval.relinearize(
                ctx, bfv_eval.multiply(ctx, a, b), rk, digit_chunk=digit_chunk
            )
            sums = helin.encrypted_vec_sum_log(ctx, prod, gks)  # [2, B, R, k, N]
            sq = bfv_eval.relinearize(
                ctx, bfv_eval.square(ctx, sums), rk, digit_chunk=digit_chunk
            ).data
            q = ctx.tb_q.q
            term = mont_mul(
                sq[:, :, :, None], w2_mont[None, None], q, ctx.tb_q.qinv_neg
            )  # [2, B, R, C, k, N]
            term = jnp.where(w2_neg[None, None], neg_mod(term, q), term)
            return tree_add_mod(term, q, axis=2)[:, :, 0]  # [2, B, C, k, N]

        stack.__dict__[jkey] = jax.jit(chunk_fn)
    return stack.__dict__[jkey]


def csp_eval_2fc(
    stack: HHEStack,
    data_ct: Ciphertext,
    w1_cts: List[Ciphertext],
    w2: np.ndarray,
    row_chunk: Optional[int] = None,
    digit_chunk: Optional[int] = None,
) -> Ciphertext:
    """Encrypted 2FC forward (completes the reference's TODO,
    ``hhe_pktnn_examples.cpp:993-997``):

    1. fc1: all R output rows evaluated in ONE batched pass — data ct
       broadcast against the stacked encrypted weight rows, BEHZ multiply,
       relinearize, log-depth rotate-reduce (each row ct then holds its
       neuron's value in every slot).
    2. square activation: batched ct x ct square + relinearize.
    3. fc2: the quantized second-layer weights are tiny integers, so each
       logit is a SMALL-NORM scalar combination logit_c = sum_r
       sign(w2[r,c]) * |w2[r,c]| * sq_r — scalar Montgomery multiplies +
       negates + adds, costing ~log2(sum|w2|) noise bits instead of the
       ~log2(N*t) a full-slot plaintext multiply would burn (which is what
       exhausts the post-transcipher budget at production N).

    Returns a class-batched ciphertext [2, B, C, k, N] (or [2, C, k, N]
    unbatched): logit c lives in EVERY slot of class-ct c.

    data_ct: [2, k, N] or batched [2, B, k, N].

    row_chunk bounds peak memory at production N: the R hidden rows are
    processed `row_chunk` at a time and the partial logit ciphertexts
    added (bit-identical to the single pass)."""
    ctx = stack.ctx
    w2 = np.asarray(w2, np.int64)
    dd = data_ct.data
    batched = dd.ndim == 4
    if not batched:
        dd = dd[:, None]  # [2, 1, k, N]
    chunk = row_chunk if (row_chunk is not None and row_chunk < len(w1_cts)) else len(w1_cts)
    fn = _jit_2fc_chunk(stack, digit_chunk=digit_chunk)
    acc = None
    for s in range(0, len(w1_cts), chunk):
        wstack = jnp.stack([w.data for w in w1_cts[s : s + chunk]], axis=1)
        w2_mont, w2_neg = _fc2_scalar_consts(ctx, w2[s : s + chunk])
        part = fn(dd, wstack, w2_mont, w2_neg, stack.rk, stack.gks)
        acc = part if acc is None else bfv_eval.add(ctx, Ciphertext(acc), Ciphertext(part)).data
    logits = Ciphertext(acc if batched else acc[:, 0])
    return logits


def decrypt_2fc_logits(stack: HHEStack, logits_ct: Ciphertext) -> np.ndarray:
    """Class-batched logits ct [2, (B,) C, k, N] -> [B, C] signed logits
    (logit c lives in every slot of class-ct c; slot 0 is read).

    The (B, C) grid folds into decrypt_batch's batch axis — one device
    program instead of B*C per-sample host decrypts (bit-identical; the
    per-sample path remains the fallback for non-full-level cts)."""
    ctx = stack.ctx
    data = logits_ct.data
    if data.ndim == 4:  # unbatched [2, C, k, N]
        data = data[:, None]
    size, B, C, kc, n = data.shape
    if kc == ctx.k:
        m = ctx.decrypt_batch(
            stack.sk, Ciphertext(data.reshape(size, B * C, kc, n))
        )
        return ctx.decode_signed_batch(m)[:, 0].reshape(B, C).astype(np.int64)
    data = np.asarray(data)
    logits = np.empty((B, C), np.int64)
    for i in range(B):
        for c in range(C):
            dec = ctx.decode_signed(
                ctx.decrypt(stack.sk, Ciphertext(jnp.asarray(data[:, i, c])))
            )
            logits[i, c] = int(dec[0])
    return logits


def hhe_2fc_inference(
    stack: HHEStack,
    w1: np.ndarray,
    w2: np.ndarray,
    samples: np.ndarray,
    labels: Optional[np.ndarray] = None,
    via_transcipher: bool = True,
    check_parity: bool = True,
    row_chunk: Optional[int] = None,
    digit_chunk: Optional[int] = None,
    run: Optional[RunConfig] = None,
) -> Dict[str, np.ndarray]:
    """MNIST/FMNIST-style 784 -> R -> 10 encrypted inference with square
    activation (reference hhe_pktnn_2fc_inference, hhe_pktnn_examples.cpp:713-
    1010, with the fc2 half completed homomorphically).

    w1 [in_dim, R], w2 [R, 10]; samples [B, in_dim] small non-negative ints.
    With via_transcipher=False the inputs are BFV-encrypted directly
    (exercising the encrypted NN eval without the PASTA stage)."""
    ctx = stack.ctx
    w1 = np.asarray(w1, np.int64)
    w2 = np.asarray(w2, np.int64)
    samples = np.atleast_2d(np.asarray(samples, np.int64))
    samples, labels = _apply_run(samples, labels, run)
    B, L = samples.shape
    in_dim, R = w1.shape

    w1_cts = helin.encrypt_weight(ctx, stack.pk, w1.T)  # one ct per output row

    if via_transcipher:
        key = pasta.get_fixed_symmetric_key()
        sym = pasta.Pasta(key, ctx.t).encrypt(samples.astype(np.uint64))
        enc_key = stack.tc.encrypt_key(stack.pk, key)
        data_ct = csp_decompose(stack, enc_key, sym)
    else:
        data = np.stack(
            [np.asarray(ctx.encrypt(stack.pk, ctx.encode(s)).data) for s in samples],
            axis=1,
        )
        data_ct = Ciphertext(jnp.asarray(data))  # [2, B, k, N]

    _debug_noise(stack, data_ct, "decomposition+flatten", run)
    logits_ct = csp_eval_2fc(
        stack, data_ct, w1_cts, w2, row_chunk=row_chunk, digit_chunk=digit_chunk
    )
    _debug_noise(stack, logits_ct, "2FC eval", run)
    logits = decrypt_2fc_logits(stack, logits_ct)
    preds = logits.argmax(1)

    if check_parity:
        t = ctx.t
        v1 = (samples @ w1) % t
        v1s = (v1 * v1) % t
        expect = (v1s @ w2) % t
        expect = np.where(expect > t // 2, expect - t, expect)
        if not np.array_equal(logits.astype(np.int64), expect):
            raise RuntimeError("2FC HHE output != plaintext mod-t output")
    out = {"logits": logits, "predictions": preds}
    if labels is not None:
        out["accuracy"] = float(np.mean(preds == np.asarray(labels).reshape(-1)[:B]))
    return out


FMNIST_WEIGHT_CSV = (
    "/root/reference/weights/fashion_mnist/fc1_weight_200epochs_bs64_clamp128.csv"
)
FMNIST_BIAS_CSV = (
    "/root/reference/weights/fashion_mnist/fc1_bias_200epochs_bs64_clamp128.csv"
)


def _jit_fc_multi(stack: HHEStack, digit_chunk: Optional[int] = None):
    """One jitted pass for a multi-class single FC layer: data ct broadcast
    against C stacked encrypted class-weight rows, BEHZ multiply,
    relinearize, log-depth rotate-sum, plain bias add — one device dispatch
    (same batching shape as the 2FC fc1 pass, minus square/fc2)."""
    import jax

    jkey = f"_jit_fc_multi_{digit_chunk}"
    if stack.__dict__.get(jkey) is None:
        ctx = stack.ctx

        def fn(dd, wstack, bias_pt, rk, gks):
            from ..ops.modular import add_mod

            a = Ciphertext(dd[:, :, None])  # [2, B, 1, k, N]
            b = Ciphertext(wstack[:, None])  # [2, 1, C, k, N]
            prod = bfv_eval.relinearize(
                ctx, bfv_eval.multiply(ctx, a, b), rk, digit_chunk=digit_chunk
            )
            sums = helin.encrypted_vec_sum_log(ctx, prod, gks)  # [2, B, C, k, N]
            c0 = add_mod(sums.data[0], bias_pt[None], ctx.tb_q.q)
            return jnp.concatenate([c0[None], sums.data[1:]], 0)

        stack.__dict__[jkey] = jax.jit(fn)
    return stack.__dict__[jkey]


def csp_eval_fc_multi(
    stack: HHEStack,
    data_ct: Ciphertext,
    w_cts: List[Ciphertext],
    bias: np.ndarray,
    digit_chunk: Optional[int] = None,
) -> Ciphertext:
    """Encrypted multi-class FC: logit_c = <x, w_c> + b_c for each of the C
    encrypted class-weight rows (the reference's per-row mult+relin+rotate-sum
    loop, ``hhe_pktnn_examples.cpp:960-992``, batched into one dispatch).
    Returns a class-batched ct [2, B, C, k, N]; logit c lives in every slot
    of class-ct c, bias already added."""
    ctx = stack.ctx
    dd = data_ct.data
    if dd.ndim == 3:
        dd = dd[:, None]
    bias = np.asarray(bias, np.int64).reshape(-1)
    bias_slots = np.tile(bias[:, None], (1, ctx.n))
    bias_pt = ctx.plain_for_add_batch(ctx.encode_batch(bias_slots))
    wstack = jnp.stack([w.data for w in w_cts], axis=1)
    fn = _jit_fc_multi(stack, digit_chunk=digit_chunk)
    return Ciphertext(fn(dd, wstack, bias_pt, stack.rk, stack.gks))


def hhe_fmnist_1fc_inference(
    stack: HHEStack,
    samples: Optional[np.ndarray] = None,
    batch: int = 4,
    via_transcipher: bool = True,
    check_parity: bool = True,
    seed: int = 0,
    run: Optional[RunConfig] = None,
) -> Dict[str, np.ndarray]:
    """The reference's ``fmnist`` dataset switch
    (``hhe_pktnn_examples.h:86-88``) validated end-to-end encrypted on its
    SHIPPED FashionMNIST model: the one-layer 784x10 weights + bias
    (``weights/fashion_mnist/fc1_{weight,bias}_200epochs_bs64_clamp128.csv``)
    through PASTA encrypt -> transcipher (7 blocks, mask+flatten) ->
    encrypted per-class product + rotate-sum + bias -> analyst decrypt ->
    argmax.

    **Documented substitution**: FMNIST images are NOT shipped
    (``data/fmnist/FashionMNIST/raw`` holds label files only), so when
    ``samples`` is None deterministic surrogate 2-bit-quantized inputs in
    [0, 4] stand in — the same pattern as ``hhe_ecg_full_inference``.  The
    hard encrypted-vs-plaintext mod-t parity check is the validated
    contract; label accuracy is not meaningful under surrogates.

    With ``via_transcipher=False`` the inputs are BFV-encrypted directly
    (exercising the shipped weights through the encrypted eval without the
    PASTA stage — the fast-suite variant; the full transcipher path is the
    slow-marked test)."""
    ctx = stack.ctx
    w = np.asarray(pocketnn.read_csv_matrix(FMNIST_WEIGHT_CSV), np.int64)
    bias = np.asarray(pocketnn.read_csv_matrix(FMNIST_BIAS_CSV), np.int64).reshape(-1)
    in_dim, C = w.shape
    assert (in_dim, C) == (784, 10) and bias.shape == (10,)
    if samples is None:
        samples = np.random.default_rng(seed).integers(0, 5, (batch, in_dim))
    samples = np.atleast_2d(np.asarray(samples, np.int64))
    samples, _ = _apply_run(samples, None, run)
    B = samples.shape[0]
    timer, ledger = metrics.Timer(), metrics.CommLedger()

    key = pasta.get_fixed_symmetric_key()
    cipher = pasta.Pasta(key, ctx.t)
    with timer.phase("user"):
        if via_transcipher:
            sym = cipher.encrypt(samples.astype(np.uint64))
            enc_key = stack.tc.encrypt_key(stack.pk, key)
            ledger.add(
                "user-csp",
                metrics.he_vec_size([enc_key]) + metrics.sym_enc_data_size(sym),
            )
        else:
            data = np.stack(
                [
                    np.asarray(ctx.encrypt(stack.pk, ctx.encode(s)).data)
                    for s in samples
                ],
                axis=1,
            )
            data_ct = Ciphertext(jnp.asarray(data))  # [2, B, k, N]
            ledger.add("user-csp", metrics.he_vec_size(_split_batch(data_ct)))
    ledger.add("analyst-user", metrics.he_pk_size(stack.pk))
    with timer.phase("analyst"):
        w_cts = helin.encrypt_weight(ctx, stack.pk, w.T)  # one ct per class
    ledger.add(
        "analyst-csp",
        metrics.he_key_size(stack.rk, stack.gks) + metrics.he_vec_size(w_cts),
    )
    with timer.phase("csp"):
        if via_transcipher:
            data_ct = csp_decompose(stack, enc_key, sym)
            _debug_noise(stack, data_ct, "decomposition+flatten", run)
        logits_ct = csp_eval_fc_multi(stack, data_ct, w_cts, bias)
    _debug_noise(stack, logits_ct, "fmnist 1fc eval", run)
    with timer.phase("analyst"):
        logits = decrypt_2fc_logits(stack, logits_ct)
    preds = logits.argmax(1)

    if check_parity:
        t = ctx.t
        expect = (samples @ w + bias) % t
        expect = np.where(expect > t // 2, expect - t, expect)
        if not np.array_equal(logits.astype(np.int64), expect):
            raise RuntimeError(
                "FMNIST FC layer's plaintext results and HHE results are different"
            )
    report = metrics.experiment_report(timer, ledger)
    if run is not None and run.verbose:
        print(metrics.format_experiment_report(report), flush=True)
    return {"logits": logits, "predictions": preds, "report": report}


ECG_WEIGHT_CSV = "/root/reference/weights/ecg/ecg_512/fc1_weight_50epochs_bz4.csv"


def hhe_ecg_full_inference(
    stack: HHEStack,
    weight_path: str = ECG_WEIGHT_CSV,
    batch: int = 512,
    eval_batch: int = 64,
    seed: int = 0,
    run: Optional[RunConfig] = None,
) -> Dict[str, object]:
    """The reference's full-dataset ECG benchmark
    (``hhe_pktnn_ecg_inference``, ``hhe_pktnn_examples.cpp:63-383``: 13,245
    MIT-BIH samples through transcipher + encrypted weight product, with
    accuracy and per-party/per-edge cost accounting) at the scale the
    shipped assets allow.

    **Documented substitution**: the reference reads
    ``mitbih_x_test_int.csv`` (``hhe_pktnn_examples.cpp:188``) but the repo
    ships only the label files (``data/mit-bih/csv/``) — the input matrix is
    absent.  This run therefore sizes itself from the shipped 13,245-row
    test label file and uses deterministic surrogate integer rows in
    [0, 64) — the ecg_512 model's weights reach |w| = 508, so inputs < 65
    keep every per-slot product inside the +/- t/2 signed range, as the
    shipped integer inputs must have (the reference decodes per-slot
    products the same way, ``hhe_pktnn_examples.cpp:305-335``).  The
    encrypted-vs-plaintext agreement ("parity") is exact and meaningful;
    ``label_accuracy`` is reported but NOT meaningful under surrogate
    inputs and is flagged as such in the report.

    All samples share the reference's fixed nonce/keystream
    (``pasta_3_plain.cpp:10``), so the CSP evaluates ONE homomorphic
    keystream and amortizes it over every sample — the design's headline
    batching win over the reference's per-record loop (CSP.cpp:247-252)."""
    ctx = stack.ctx
    w = np.asarray(pocketnn.read_csv_matrix(weight_path), np.int64).reshape(-1)
    assert w.shape == (transcipher.T,)
    from ..models import loaders

    labels = loaders.load_mitbih_labels("test")
    n = run.sample_limit(len(labels)) if run is not None else len(labels)
    labels = labels[:n] * 128  # reference scales binary labels to {0, 128}
    rng = np.random.default_rng(seed)
    x = rng.integers(0, 64, (n, transcipher.T)).astype(np.uint64)

    timer, ledger = metrics.Timer(), metrics.CommLedger()
    key = pasta.get_fixed_symmetric_key()
    cipher = pasta.Pasta(key, ctx.t)
    with timer.phase("user"):
        sym = cipher.encrypt(x)
        enc_key = stack.tc.encrypt_key(stack.pk, key)
    ledger.add("analyst-user", metrics.he_pk_size(stack.pk))
    ledger.add(
        "user-csp", metrics.he_vec_size([enc_key]) + metrics.sym_enc_data_size(sym)
    )
    with timer.phase("analyst"):
        weight_ct = helin.encrypt_weight(ctx, stack.pk, w[None, :])[0]
    ledger.add(
        "analyst-csp",
        metrics.he_key_size(stack.rk, stack.gks) + metrics.he_vec_size([weight_ct]),
    )

    # pad the sample count to a batch multiple so every device program runs
    # at ONE static shape (a ragged tail chunk would force a fresh compile
    # per distinct shape through the tunnel); padded rows are discarded
    pad = (-n) % batch
    sym_p = np.concatenate([sym, sym[:pad]], axis=0) if pad else sym
    eval_batch = min(eval_batch, batch)
    preds = []
    result_mb = 0.0
    for s in range(0, len(sym_p), batch):
        chunk = sym_p[s : s + batch]
        with timer.phase("csp"):
            data_ct = csp_decompose(stack, enc_key, chunk)
            dd = data_ct.data
            wct = Ciphertext(
                weight_ct.data[:, None] if dd.ndim == 4 else weight_ct.data
            )
            # the ct x ct weight product + relinearize is evaluated in
            # eval_batch sub-slices: BEHZ + key-switch temporaries scale
            # with the batch, and 512-sample slices exceed HBM at
            # production N
            prods = [
                csp_eval_1fc(
                    stack, Ciphertext(dd[:, e : e + eval_batch]), wct, do_sum=False
                )
                for e in range(0, chunk.shape[0], eval_batch)
            ]
        # result size metered per sample frame, analytically — serializing
        # 45 GB of result cts through the tunnel just to len() them
        # dominated the wall clock at full scale
        result_mb += sum(metrics.he_vec_size_analytic(p) for p in prods)
        with timer.phase("analyst"):
            # one batched decrypt per chunk (decrypt_batch is the analyst's
            # vectorized path; 8 sub-slice dispatches -> 1)
            merged = Ciphertext(jnp.concatenate([p.data for p in prods], axis=1))
            preds.extend(analyst_decrypt_sum_sigmoid(stack, merged, transcipher.T))
    # meter only the n real samples (padded rows never cross the wire)
    ledger.add("analyst-csp", result_mb * (n / len(sym_p)))
    preds = np.asarray(preds)[:n]

    # encrypted-vs-plaintext agreement (the reference's parity contract)
    sums = (x.astype(np.int64) * w).sum(1)
    sig = np.asarray(pocketnn.simple_pocket_sigmoid(sums))
    expect = np.where(sig > 64, 128, 0)
    agreement = float(np.mean(preds == expect))
    report = metrics.experiment_report(
        timer,
        ledger,
        accuracy=agreement,
        extra={
            "samples": n,
            "label_accuracy": float(np.mean(preds == labels)),
            "label_accuracy_note": (
                "surrogate inputs (mitbih_x_test_int.csv not shipped) — "
                "label_accuracy is not meaningful; 'accuracy' is the "
                "encrypted-vs-plaintext agreement"
            ),
        },
    )
    if run is not None and run.verbose:
        print(metrics.format_experiment_report(report), flush=True)
    return {"predictions": preds, "agreement": agreement, "report": report}


def hhe_ecg_inference(
    stack: HHEStack,
    weight: np.ndarray,
    samples: np.ndarray,
    labels: Optional[np.ndarray] = None,
    run: Optional[RunConfig] = None,
) -> Dict[str, np.ndarray]:
    """ECG pipeline (128-length, single block, host-side sum+sigmoid)."""
    ctx = stack.ctx
    w = np.asarray(weight, np.int64).reshape(-1)
    samples = np.atleast_2d(np.asarray(samples, np.uint64))
    samples, labels = _apply_run(samples, labels, run)
    B, L = samples.shape
    assert L == transcipher.T and w.shape == (L,)

    key = pasta.get_fixed_symmetric_key()
    sym = pasta.Pasta(key, ctx.t).encrypt(samples)
    enc_key = stack.tc.encrypt_key(stack.pk, key)
    weight_ct = helin.encrypt_weight(ctx, stack.pk, w[None, :])[0]

    data_ct = csp_decompose(stack, enc_key, sym)
    _debug_noise(stack, data_ct, "decomposition", run)
    wct = Ciphertext(
        weight_ct.data[:, None] if np.asarray(data_ct.data).ndim == 4 else weight_ct.data
    )
    prod = csp_eval_1fc(stack, data_ct, wct, do_sum=False)
    _debug_noise(stack, prod, "encrypted weight product", run)
    preds = analyst_decrypt_sum_sigmoid(stack, prod, L)
    out = {"predictions": preds}
    if labels is not None:
        out["accuracy"] = float(np.mean(preds == np.asarray(labels).reshape(-1)[:B]))
    return out
