"""Pure-HE encrypted HCNN MNIST inference — the reference speedtest workload.

Equivalent of ``qat/src/speedtest_he_mnist_works.py`` (Pyfhel, BFV n=16384,
t_bits=47): a QAT-trained quantized HCNN

    conv(1->5, 5x5, s2) -> square -> conv(5->50, 5x5, s2)
    -> flatten -> square -> fc(800->10)

is evaluated on encrypted MNIST images with the rotation-conv kernels from
``hhe_tpu.ops.heconv``, and must match the plaintext integer model's logits
EXACTLY (the reference's acc vs acc_he comparison, ``speedtest:470-520`` —
here a hard parity throw like ``hhe_pktnn_examples.cpp:692-699``).
"""

from __future__ import annotations

import dataclasses
import time
from typing import Optional

import numpy as np

from ..models import loaders
from ..ops import bfv, heconv, primes
from ..ops.bfv import Ciphertext


def conv_plain_t(n: int = 16384, bits: int = 47) -> int:
    """An NTT-friendly plaintext prime of ~`bits` bits (reference t_bits=47,
    ``speedtest_he_mnist_works.py:396``)."""
    m = 2 * n
    t = ((1 << bits) - 1) // m * m + 1
    while not primes.is_prime(t):
        t -= m
    return t


@dataclasses.dataclass
class HEConvReport:
    n_images: int
    int_acc: float  # plaintext integer model accuracy on the batch
    he_matches_int: bool  # encrypted logits == integer logits (hard check)
    per_image_s: float
    noise_left: int


def he_mnist_conv_inference(
    n_images: int = 2,
    train_subset: int = 3000,
    epochs: int = 2,
    n: int = 16384,
    data_limbs: int = 13,
    seed: int = 0,
    qat: Optional["object"] = None,
    verbose: bool = True,
) -> HEConvReport:
    from . import qat as qat_mod

    x_all, y_all = loaders.load_mnist_test(limit=train_subset + 200)
    # reference input scaling: int(pixel/255 * 3), levels 0..3 (speedtest:12)
    x_img = (x_all.reshape(-1, 1, 28, 28) * 3 + 2) // 4  # from 0..4 to 0..3
    xtr, ytr = x_img[:train_subset], y_all[:train_subset]
    xte, yte = x_img[train_subset : train_subset + 200], y_all[train_subset :][:200]

    if qat is None:
        qat = qat_mod.train_quant_hcnn(
            xtr, ytr, xte, yte, epochs=epochs, seed=seed
        )
    if verbose:
        print(
            f"[QAT] HCNN float acc {qat.float_acc:.3f}  int acc {qat.int_acc:.3f}"
        )

    t = conv_plain_t(n)
    ctx = bfv.Context(bfv.BFVParams(n=n, t=t, data_limbs=data_limbs, seed=seed))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)

    spec1 = heconv.ConvSpec(qat.k1_int, (1, 28, 28), 2, 1)
    spec2 = heconv.ConvSpec(qat.k2_int, (5, 12, 12), 2, 2)
    elts = heconv.conv_galois_elts(ctx, [spec1, spec2], 28)
    rk, gks = ctx.keygen_eval_keys_device(sk, elts, include_relin=True, seed=seed)

    pts1 = heconv.conv_plaintexts(ctx, spec1, 28)
    pts2 = heconv.conv_plaintexts(ctx, spec2, 28)
    fc_pts = heconv.fc_plaintexts(ctx, qat.fc_int, spec2, 28)

    sel = xte[:n_images].astype(np.int64)
    labels = yte[:n_images]
    want_logits = np.stack(
        [heconv.hcnn_forward_int(img, qat.k1_int, qat.k2_int, qat.fc_int) for img in sel]
    )

    got = np.zeros_like(want_logits)
    noise_left = 10**9
    t0 = time.time()
    for i, img in enumerate(sel):
        ct = ctx.encrypt(pk, ctx.encode(img.reshape(-1)))
        ct = Ciphertext(ct.data[:, None])  # [size, Ci=1, k, N]
        a = heconv.he_conv2d(ctx, ct, spec1, pts1, gks, 28)
        a = heconv.he_square(ctx, a, rk)
        b = heconv.he_conv2d(ctx, a, spec2, pts2, gks, 28)
        b = heconv.he_square(ctx, b, rk)
        logits_ct = heconv.he_fc_from_conv(ctx, b, fc_pts, gks)
        data = np.asarray(logits_ct.data)
        for c in range(10):
            ct_c = Ciphertext(data[:, c])
            got[i, c] = ctx.decode_signed(ctx.decrypt(sk, ct_c))[0]
        noise_left = min(noise_left, ctx.noise_budget(sk, Ciphertext(data[:, 0])))
    per_image = (time.time() - t0) / n_images

    he_ok = bool(np.array_equal(got, want_logits))
    if not he_ok:
        raise AssertionError(
            f"encrypted HCNN logits diverge from the integer model:\n{got}\nvs\n{want_logits}"
        )
    int_acc = float(np.mean(want_logits.argmax(1) == labels))
    if verbose:
        print(
            f"[HE] {n_images} images, exact logit parity, "
            f"{per_image:.1f}s/image, min noise left {noise_left} bits, "
            f"batch int acc {int_acc:.2f}"
        )
    return HEConvReport(n_images, int_acc, he_ok, per_image, noise_left)
