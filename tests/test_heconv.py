"""Encrypted rotation-conv parity (reference speedtest_he_mnist_works.py).

A small HCNN (conv-square-conv-square-fc, stride 2) evaluated under BFV
must produce exactly the integer plaintext model's logits.
"""

import numpy as np
import pytest

from hhe_tpu.ops import bfv, heconv
from hhe_tpu.ops.bfv import Ciphertext


@pytest.fixture(scope="module")
def stack():
    # two squarings blow past 17-bit t; a 31-bit NTT-friendly plaintext
    # modulus keeps the integer pipeline overflow-free (the reference uses
    # t_bits=47 at MNIST scale, speedtest_he_mnist_works.py:396)
    from hhe_tpu.ops import primes

    t = primes.ntt_primes(2048, 31, 1)[0]
    ctx = bfv.Context(bfv.BFVParams(n=2048, t=t, data_limbs=11, seed=7))
    sk = ctx.keygen_secret()
    pk = ctx.keygen_public(sk)
    return ctx, sk, pk


def test_hcnn_encrypted_parity(stack):
    ctx, sk, pk = stack
    rng = np.random.default_rng(3)
    H = W = 8
    k1 = rng.integers(-2, 2, (2, 1, 3, 3))  # conv1: 1->2, 3x3, s2 -> 3x3
    k2 = rng.integers(-2, 2, (3, 2, 3, 3))  # conv2: 2->3, 3x3, s2 -> 1x1
    fc = rng.integers(-2, 2, (2, 3))  # 3 -> 2 classes
    x = rng.integers(0, 4, (1, H, W))

    want = heconv.hcnn_forward_int(x, k1, k2, fc)

    spec1 = heconv.ConvSpec(k1, (1, H, W), 2, 1)
    spec2 = heconv.ConvSpec(k2, (2, 3, 3), 2, 2)
    elts = heconv.conv_galois_elts(ctx, [spec1, spec2], W)
    gks = ctx.keygen_galois(ctx_sk(stack), elts)
    rk = ctx.keygen_relin(ctx_sk(stack))

    img = np.zeros(H * W, np.int64)
    img[: H * W] = x.reshape(-1)
    ct = ctx.encrypt(pk, ctx.encode(img))
    ct = Ciphertext(ct.data[:, None])  # [size, Ci=1, k, N]

    pts1 = heconv.conv_plaintexts(ctx, spec1, W)
    pts2 = heconv.conv_plaintexts(ctx, spec2, W)
    fc_pts = heconv.fc_plaintexts(ctx, fc, spec2, W)

    a = heconv.he_conv2d(ctx, ct, spec1, pts1, gks, W)
    a = heconv.he_square(ctx, a, rk)
    b = heconv.he_conv2d(ctx, a, spec2, pts2, gks, W)
    b = heconv.he_square(ctx, b, rk)
    logits_ct = heconv.he_fc_from_conv(ctx, b, fc_pts, gks)

    data = np.asarray(logits_ct.data)  # [2, classes, k, N]
    got = np.empty(2, np.int64)
    for c in range(2):
        pt = ctx.decrypt(sk, Ciphertext(data[:, c]))
        got[c] = ctx.decode_signed(pt)[0]
    assert np.array_equal(got, want), (got, want)


def ctx_sk(stack):
    return stack[1]


@pytest.mark.slow
def test_he_mnist_conv_workload():
    """Full-scale reference speedtest equivalent: QAT HCNN on encrypted
    MNIST at N=16384, t~2^47 — hard logit-parity check inside."""
    from hhe_tpu.workloads import he_conv

    rep = he_conv.he_mnist_conv_inference(
        n_images=1, train_subset=1500, epochs=1, verbose=False
    )
    assert rep.he_matches_int
    assert rep.noise_left > 0
