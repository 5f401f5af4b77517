"""Encrypted convolution — the rotation-conv HCNN path.

TPU-native equivalent of the reference's pure-HE MNIST conv inference
(``qat/src/speedtest_he_mnist_works.py:277-357`` ``rotation_conv`` with
Pyfhel, BFV n=16384, t_bits=47), evaluating the QAT HCNN from
``qat/notebooks/mnist_conv_train.ipynb``:

    conv(1->5, 5x5, stride 2) -> square -> conv(5->50, 5x5, stride 2)
    -> flatten -> square -> fc(800->10)

Design (TPU-first, not a port):

- The image is packed row-major in slots; each kernel tap is one Galois
  rotation of the encrypted input (shared across output channels).
- Stride-s outputs stay on the *input* coordinate grid (the reference's
  "data_stride" dilation, ``speedtest:330-345``), so downstream layers just
  scale their tap offsets — no repacking rotations between layers.
- All output channels evaluate as ONE batched tensor op per tap (the
  reference loops channels x taps one ciphertext multiply at a time), and
  tap products accumulate in NTT domain — a single inverse NTT per layer.
- The final FC never repacks: each class weight vector is scattered (host,
  plaintext) to the exact slots where the flattened conv activations live:
  one batched multiply + channel-sum + one log-depth rotate-sum for ALL
  classes at once.
"""

from __future__ import annotations

from typing import Dict, List, NamedTuple, Sequence, Tuple

import numpy as np
import jax.numpy as jnp

from . import bfv_eval, helin, ntt
from .bfv import Ciphertext, Context, KSwitchKey
from .modular import add_mod, mont_mul


class ConvSpec(NamedTuple):
    """One conv layer on the slot grid.

    in_shape: (Ci, H, W) logical input dims; grid_stride: dilation of the
    input on the slot grid (1 for the raw image, product of previous strides
    after).  Channels are batched ciphertext tensors [size, Ci, k, N], so
    taps are purely spatial and one rotation serves every channel."""

    kernel: np.ndarray  # [Co, Ci, Kh, Kw] int
    in_shape: Tuple[int, int, int]
    stride: int
    grid_stride: int


def conv_out_shape(spec: ConvSpec) -> Tuple[int, int, int]:
    ci, h, w = spec.in_shape
    co, _, kh, kw = spec.kernel.shape
    return (co, (h - kh) // spec.stride + 1, (w - kw) // spec.stride + 1)


def conv_tap_offsets(spec: ConvSpec, img_w: int) -> List[int]:
    """Slot rotation offset of each spatial (j, i) kernel tap."""
    _, _, kh, kw = spec.kernel.shape
    g = spec.grid_stride
    return [(j * img_w + i) * g for j in range(kh) for i in range(kw)]


def conv_galois_elts(ctx: Context, specs: Sequence[ConvSpec], img_w: int) -> List[int]:
    """All Galois elements the encrypted HCNN needs (conv taps + log-sum)."""
    elts = set()
    for spec in specs:
        for off in conv_tap_offsets(spec, img_w):
            if off:
                elts.add(ctx.galois_elt_from_step(off))
    for g in helin.vec_sum_galois_elts(ctx):
        elts.add(g)
    return sorted(elts)


def _valid_mask(spec: ConvSpec, img_w: int, n_slots: int) -> np.ndarray:
    """1 at the slot of each (oy, ox) output position (input-grid coords)."""
    _, oh, ow = conv_out_shape(spec)
    g = spec.grid_stride * spec.stride
    m = np.zeros(n_slots, np.int64)
    for oy in range(oh):
        for ox in range(ow):
            m[(oy * img_w + ox) * g] = 1
    return m


def conv_plaintexts(ctx: Context, spec: ConvSpec, img_w: int) -> jnp.ndarray:
    """Weight-and-validity-masked plaintexts per (spatial tap, in-channel,
    out-channel): [taps, Ci, Co, k, N] NTT+Mont — one fused multiply per tap."""
    co, ci_n, kh, kw = spec.kernel.shape
    mask = _valid_mask(spec, img_w, ctx.n // 2)
    taps = []
    for j in range(kh):
        for i in range(kw):
            rows = [
                mask * int(spec.kernel[o, ci, j, i])
                for ci in range(ci_n)
                for o in range(co)
            ]
            taps.append(ctx.encode_batch(np.stack(rows)))
    polys = np.stack(taps)  # [taps, Ci*Co, N]
    return ctx.plain_for_mul_batch(polys.reshape(-1, ctx.n)).reshape(
        kh * kw, ci_n, co, ctx.k, ctx.n
    )


def he_conv2d(
    ctx: Context,
    ct: Ciphertext,
    spec: ConvSpec,
    pts: jnp.ndarray,
    gks: Dict[int, KSwitchKey],
    img_w: int,
) -> Ciphertext:
    """Rotation-based encrypted conv (reference rotation_conv,
    ``speedtest_he_mnist_works.py:277-357``).

    ct: [size, Ci, k, N] (channel-batched; wrap a single packed image as
    Ci = 1).  One batched rotation per spatial tap serves every channel.
    Returns [size, Co, k, N] — output channels batched in one tensor."""
    q, qi = ctx.tb_q.q, ctx.tb_q.qinv_neg
    offsets = conv_tap_offsets(spec, img_w)
    acc = None  # NTT-domain accumulator [size, Co, k, N]
    for t_i, off in enumerate(offsets):
        rot = ct if off == 0 else bfv_eval.rotate_rows(ctx, ct, off, gks)
        f = ntt.ntt_fwd(rot.data, ctx.tb_q)  # [size, Ci, k, N]
        g = mont_mul(f[:, :, None], pts[t_i][None], q, qi)  # [size, Ci, Co, k, N]
        g0 = g[:, 0]
        for c in range(1, g.shape[1]):
            g0 = add_mod(g0, g[:, c], q)
        acc = g0 if acc is None else add_mod(acc, g0, q)
    return Ciphertext(ntt.ntt_inv(acc, ctx.tb_q))


def he_square(ctx: Context, ct: Ciphertext, rk: KSwitchKey) -> Ciphertext:
    """Square + relinearize; works on channel-batched tensors [size, Co, k, N]."""
    return bfv_eval.relinearize(ctx, bfv_eval.square(ctx, ct), rk)


def fc_plaintexts(
    ctx: Context, weight: np.ndarray, spec_last: ConvSpec, img_w: int
) -> jnp.ndarray:
    """Scatter each FC class-weight vector to the slots where the flattened
    conv output lives: [classes, Co, k, N] NTT+Mont."""
    co, oh, ow = conv_out_shape(spec_last)
    g = spec_last.grid_stride * spec_last.stride
    classes = weight.shape[0]
    assert weight.shape[1] == co * oh * ow, (weight.shape, co, oh, ow)
    polys = np.zeros((classes, co, ctx.n // 2), np.int64)
    w = weight.reshape(classes, co, oh, ow)
    for oy in range(oh):
        for ox in range(ow):
            polys[:, :, (oy * img_w + ox) * g] = w[:, :, oy, ox]
    enc = ctx.encode_batch(polys.reshape(classes * co, -1))
    return ctx.plain_for_mul_batch(enc).reshape(classes, co, ctx.k, ctx.n)


def he_fc_from_conv(
    ctx: Context,
    ct: Ciphertext,
    fc_pts: jnp.ndarray,
    gks: Dict[int, KSwitchKey],
) -> Ciphertext:
    """FC over the channel-batched conv output without repacking.

    ct: [size, Co, k, N]; fc_pts: [classes, Co, k, N].  Returns a
    class-batched ciphertext [size, classes, k, N]; after the log-depth
    rotate-sum every slot of row 0 holds the class logit."""
    q, qi = ctx.tb_q.q, ctx.tb_q.qinv_neg
    f = ntt.ntt_fwd(ct.data, ctx.tb_q)  # [size, Co, k, N]
    g = mont_mul(f[:, None], fc_pts[None], q, qi)  # [size, classes, Co, k, N]
    co = g.shape[2]
    s = g[:, :, 0]
    for c in range(1, co):
        s = add_mod(s, g[:, :, c], q)  # sum channels -> [size, classes, k, N]
    summed = Ciphertext(ntt.ntt_inv(s, ctx.tb_q))
    return helin.encrypted_vec_sum_log(ctx, summed, gks)


# ---------------------------------------------------------------------------
# Plaintext integer golden model (matches the QAT integer forward exactly)
# ---------------------------------------------------------------------------


def conv2d_int(x: np.ndarray, kernel: np.ndarray, stride: int) -> np.ndarray:
    """Integer conv, no padding: x [Ci, H, W], kernel [Co, Ci, Kh, Kw]."""
    ci, h, w = x.shape
    co, _, kh, kw = kernel.shape
    oh, ow = (h - kh) // stride + 1, (w - kw) // stride + 1
    out = np.zeros((co, oh, ow), np.int64)
    for oy in range(oh):
        for ox in range(ow):
            patch = x[:, oy * stride : oy * stride + kh, ox * stride : ox * stride + kw]
            out[:, oy, ox] = np.tensordot(kernel, patch, axes=([1, 2, 3], [0, 1, 2]))
    return out


def hcnn_forward_int(
    x: np.ndarray, k1: np.ndarray, k2: np.ndarray, fc: np.ndarray
) -> np.ndarray:
    """Integer HCNN forward (conv-square-conv-square-fc), the parity target."""
    a = conv2d_int(x, k1, 2)
    a = a * a
    b = conv2d_int(a, k2, 2)
    b = (b * b).reshape(-1)
    return fc @ b
