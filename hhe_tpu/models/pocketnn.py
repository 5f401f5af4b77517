"""Integer-only neural network layer — the PocketNN equivalent, as JAX transforms.

TPU-native re-design of the reference's vendored PocketNN
(``libs/pocketnn/``): int32 tensors, C-style truncating division, functional
layers + pure jitted train/eval steps instead of mutable ``pktmat`` objects.

Semantics replicated exactly (needed for accuracy parity with the shipped
quantized weights):

- activations with their piecewise integer formulas and inverse-gradient
  outputs (``libs/pocketnn/src/pktnn_actv.cpp:115-491``)
- FC forward = x @ W + b then activation; weights clamped to [-127, 128]
  (``libs/pocketnn/src/pktnn_fc.cpp:136-171``)
- DFA backward: deltas = loss_delta @ B / grad_inv with a fixed random
  feedback matrix, integer SGD update ``W += (x^T @ deltas) / (-lr_inv)``
  with truncating division and clamping (``pktnn_fc.cpp:241-343``)
- L2 / pocket-cross losses (``libs/pocketnn/src/pktnn_loss.cpp``)
- integer sigmoids used by the HHE pipeline: ``simple_pocket_sigmoid``
  (reference ``src/util/utils.cpp:56-76``) and ``int_sigmoid``
  (``src/util/utils.h:94-100``).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, List, NamedTuple, Optional, Sequence, Tuple

import numpy as np
import jax
import jax.numpy as jnp

K_BIT = 8  # reference pktnn_consts.h:5
UNSIGNED_4BIT_MAX = 15  # reference pktnn_consts.h:11
PKT_MAX = 127
PKT_MIN = -127
SHRT_MAX = 32767
INT_MAX = 2**31 - 1


def div_trunc(a, b):
    """C-style integer division (truncate toward zero); b may be array or int."""
    return (jnp.sign(a) * (jnp.abs(a) // jnp.abs(b)) * jnp.sign(b)).astype(a.dtype)


def div_trunc_np(a, b):
    a = np.asarray(a, np.int64)
    b = np.asarray(b, np.int64)
    return np.sign(a) * (np.abs(a) // np.abs(b)) * np.sign(b)


# ---------------------------------------------------------------------------
# Activations: each returns (out, grad_inv), both int32
# ---------------------------------------------------------------------------


def _piecewise(x, joints, fns, grads, ymin, ymax):
    out = jnp.full_like(x, ymin)
    gi = jnp.full_like(x, grads[0])
    conds = [x < j for j in joints]
    # segments between joints
    for i, fn in enumerate(fns):
        seg = (~conds[i]) & conds[i + 1]
        out = jnp.where(seg, fn(x), out)
        gi = jnp.where(seg, grads[i + 1], gi)
    top = ~conds[-1]
    out = jnp.where(top, ymax, out)
    gi = jnp.where(top, grads[-1], gi)
    return out, gi


_JOINTS = (-127, -74, -31, 32, 75, 128)
_SLOPES_INV = (PKT_MAX, 8, 2, 1, 2, 8, PKT_MAX)


def pocket_sigmoid(x, k=K_BIT, fan_in=0):
    """Reference pktactv::pocketSigmoid (pktnn_actv.cpp:115-198)."""
    xs = div_trunc(x, 1 << k)
    fns = [
        lambda v: div_trunc(v, 8) + 20,
        lambda v: div_trunc(v, 2) + 48,
        lambda v: v + 64,
        lambda v: div_trunc(v, 2) + 80,
        lambda v: div_trunc(v, 8) + 108,
    ]
    return _piecewise(xs, _JOINTS, fns, _SLOPES_INV, 1, PKT_MAX)


def pocket_tanh(x, k=K_BIT, fan_in=1):
    """Reference pktactv::pocketTanh (divisor includes the fan-in)."""
    xs = div_trunc(x, (1 << k) * max(fan_in, 1))
    fns = [
        lambda v: div_trunc(v, 4) - 88,
        lambda v: v - 32,
        lambda v: 2 * v,
        lambda v: v + 32,
        lambda v: div_trunc(v, 4) + 88,
    ]
    return _piecewise(xs, _JOINTS, fns, _SLOPES_INV, PKT_MIN, PKT_MAX)


def rescale(x, k=K_BIT, fan_in=0):
    return div_trunc(x, 1 << k), jnp.ones_like(x)


def pocket_relu8bit(x, k=K_BIT, fan_in=0):
    out = jnp.clip(x, 0, PKT_MAX)
    gi = jnp.where((x < 0) | (x > PKT_MAX), INT_MAX, 1).astype(x.dtype)
    return out, gi


def pocket_leakyrelu(x, k=K_BIT, fan_in=0):
    mx = SHRT_MAX
    out = jnp.where(x < 0, div_trunc(x, 5), x)
    out = jnp.clip(out, -mx, mx)
    gi = jnp.where((x < -mx) | (x >= mx), INT_MAX, jnp.where(x < 0, 5, 1)).astype(x.dtype)
    return out, gi


def plu(x, k=K_BIT, fan_in=0):
    """PLU(x) = max[a(x+c)-c, min{a(x-c)+c, x}] with 1/a=10, c=1 (pktnn_actv.cpp plu)."""
    c = 1
    thres_max = div_trunc(x + c, 10) - c
    thres_min = div_trunc(x - c, 10) + c
    v = jnp.minimum(x, thres_min)
    v = jnp.maximum(v, thres_max)
    out = jnp.clip(v, PKT_MIN, PKT_MAX)
    safe = jnp.where(v == 0, 1, v)
    gi = jnp.where(
        (v < PKT_MIN) | (v > PKT_MAX), PKT_MAX, div_trunc(x, safe)
    ).astype(x.dtype)
    return out, gi


def pocket_softmax(x, k=K_BIT, fan_in=0):
    """Rowwise integer softmax: clamp nonpositives to 0, rescale rows to sum
    ~INT_MAX (reference pktactv::pocketSoftmax, pktnn_actv.cpp:283-330)."""
    pos = jnp.maximum(x, 0)
    row_sum = jnp.maximum(pos.sum(axis=-1, keepdims=True), 1)
    scale = div_trunc(jnp.full_like(row_sum, INT_MAX), row_sum)
    out = pos * scale
    gi = jnp.where(out == 0, INT_MAX, 1).astype(x.dtype)
    return out, gi


def as_is(x, k=K_BIT, fan_in=0):
    return x, jnp.ones_like(x)


def square(x, k=K_BIT, fan_in=0):
    return x * x, 2 * x


ACTIVATIONS = {
    "pocket_sigmoid": pocket_sigmoid,
    "pocket_tanh": pocket_tanh,
    "rescale": rescale,
    "pocket_relu8bit": pocket_relu8bit,
    "pocket_leakyrelu": pocket_leakyrelu,
    "plu": plu,
    "pocket_softmax": pocket_softmax,
    "as_is": as_is,
    "square": square,
}


def simple_pocket_sigmoid(x):
    """7-segment integer sigmoid used at analyst decrypt time
    (reference src/util/utils.cpp:56-76). Works on ints or arrays."""
    x = jnp.asarray(x, jnp.int32)
    out, _ = _piecewise(
        x,
        _JOINTS,
        [
            lambda v: div_trunc(v, 8) + 20,
            lambda v: div_trunc(v, 2) + 48,
            lambda v: v + 64,
            lambda v: div_trunc(v, 2) + 80,
            lambda v: div_trunc(v, 8) + 108,
        ],
        _SLOPES_INV,
        1,
        PKT_MAX,
    )
    return out


def int_sigmoid(x):
    """Step function (reference src/util/utils.h:94-100)."""
    return jnp.where(jnp.asarray(x) <= 0, 0, 1)


# ---------------------------------------------------------------------------
# Fully-connected layer (functional)
# ---------------------------------------------------------------------------


class FCParams(NamedTuple):
    weight: jnp.ndarray  # [in, out] int32
    bias: jnp.ndarray  # [1, out] int32
    dfa: Optional[jnp.ndarray] = None  # [n_classes, out] int32 feedback
    gamma: Optional[jnp.ndarray] = None  # [1, out] int32 (batch-norm scale)
    beta: Optional[jnp.ndarray] = None  # [1, out] int32 (batch-norm shift)


@dataclasses.dataclass(frozen=True)
class FCSpec:
    in_dim: int
    out_dim: int
    actv: str = "pocket_tanh"
    use_dfa: bool = True
    use_bn: bool = False  # reference pktfc::useBatchNormalization (pktnn_fc.cpp:119-127)


def fc_init(
    rng: np.random.Generator, spec: FCSpec, n_classes: int, he_init: bool = False
) -> FCParams:
    if he_init:
        # reference pktfc::initHeWeightBias (pktnn_fc.cpp:89-110)
        rng_w = int(np.sqrt(12 * SHRT_MAX // (spec.in_dim + spec.out_dim)))
        w = jnp.asarray(
            rng.integers(-rng_w, rng_w + 1, (spec.in_dim, spec.out_dim)), jnp.int32
        )
        b = jnp.asarray(rng.integers(-rng_w, rng_w + 1, (1, spec.out_dim)), jnp.int32)
    else:
        w = jnp.zeros((spec.in_dim, spec.out_dim), jnp.int32)
        b = jnp.zeros((1, spec.out_dim), jnp.int32)
    dfa = None
    if spec.use_dfa:
        # He-style integer range (reference pktnn_fc.cpp:72-81)
        rng_range = int(np.sqrt(12 * SHRT_MAX // (spec.in_dim + spec.out_dim)))
        dfa = jnp.asarray(
            rng.integers(-rng_range, rng_range + 1, (n_classes, spec.out_dim)),
            jnp.int32,
        )
    gamma = beta = None
    if spec.use_bn:
        # reference lazily inits gamma=1, beta=0 on first forward (pktnn_fc.cpp:403-411)
        gamma = jnp.ones((1, spec.out_dim), jnp.int32)
        beta = jnp.zeros((1, spec.out_dim), jnp.int32)
    return FCParams(w, b, dfa, gamma, beta)


def floor_isqrt(x):
    """Elementwise floor(sqrt(x)) for nonnegative int32 (reference
    pktmat::floorSqrt used by squareRootOf, pktnn_mat.cpp:929-944)."""
    # Reference returns 0 for x <= 0 (negative reachable when the int32
    # variance accumulation wraps) — clamp first; sqrt of a negative float
    # would yield NaN with an undefined uint32 cast.
    x = jnp.maximum(x, 0)
    # float32 estimate then exact repair in uint32 (squares up to 2^31 fit;
    # works without jax x64 and keeps TPU lanes 32-bit)
    s = jnp.floor(jnp.sqrt(x.astype(jnp.float32))).astype(jnp.uint32)
    xu = x.astype(jnp.uint32)
    for _ in range(2):
        s = jnp.where((s + 1) * (s + 1) <= xu, s + 1, s)  # round-down repair
        s = jnp.where(s * s > xu, s - 1, s)  # round-up repair
    return s.astype(x.dtype)


class BNCache(NamedTuple):
    standardized: jnp.ndarray  # [B, out] x_hat (pktnn_fc.cpp:387-400)
    stdev_eps: jnp.ndarray  # [1, out] floorSqrt(var), 0 -> 1


def batch_normalize(inter: jnp.ndarray, gamma, beta):
    """Integer batch-norm over a minibatch (reference
    pktfc::batchNormalization, pktnn_fc.cpp:345-427): truncating-division
    mean/variance, floor-sqrt stdev with eps->1, x_hat scaled by PKT_MAX=127,
    then gamma*x_hat + beta. Returns (bn_out, BNCache)."""
    n_items = inter.shape[0]
    mean = div_trunc(inter.sum(axis=0, keepdims=True), n_items)
    devi = inter - mean
    var = div_trunc((devi * devi).sum(axis=0, keepdims=True), n_items)
    stdev = floor_isqrt(var)
    stdev = jnp.where(stdev == 0, 1, stdev)
    xhat = div_trunc(PKT_MAX * devi, stdev)
    return gamma * xhat + beta, BNCache(xhat, stdev)


def fc_forward(params: FCParams, x: jnp.ndarray, spec: FCSpec):
    """out = actv(x @ W + b); returns (out, grad_inv[, BNCache]).
    x int32 [B, in]. With use_bn the bias is NOT added — the reference
    normalizes x @ W and feeds gamma*x_hat+beta to the activation
    (pktnn_fc.cpp:136-153)."""
    if spec.use_bn:
        inter = x @ params.weight
        bn, cache = batch_normalize(inter, params.gamma, params.beta)
        out, gi = ACTIVATIONS[spec.actv](bn, K_BIT, spec.in_dim)
        return out, gi, cache
    inter = x @ params.weight + params.bias
    out, gi = ACTIVATIONS[spec.actv](inter, K_BIT, spec.in_dim)
    return out, gi, None


# ---------------------------------------------------------------------------
# Losses (reference pktnn_loss.cpp)
# ---------------------------------------------------------------------------


def batch_l2_loss(y, y_hat):
    d = y_hat - y
    return jnp.sum(div_trunc(d * d, 2))


def batch_l2_loss_delta(y, y_hat):
    return y_hat - y


def batch_pocket_cross_loss(y_onehot_intmax, y_hat):
    """Reference batchPocketCrossLoss: sum of (INT_MAX - y_hat) at one-hot
    positions marked INT_MAX (pktnn_loss.cpp:74-88)."""
    mask = y_onehot_intmax == INT_MAX
    # float accumulator: per-item terms are ~2^31 and int32 would overflow
    return jnp.sum(jnp.where(mask, (INT_MAX - y_hat).astype(jnp.float64), 0.0))


def batch_pocket_cross_loss_delta(y_onehot_intmax, y_hat):
    """Reference batchPocketCrossLossDelta: -1 at one-hot positions."""
    return jnp.where(y_onehot_intmax == INT_MAX, -1, 0).astype(jnp.int32)


# ---------------------------------------------------------------------------
# DFA training step over a stack of FC layers
# ---------------------------------------------------------------------------


class MLP(NamedTuple):
    params: Tuple[FCParams, ...]


def mlp_init(
    seed: int, specs: Sequence[FCSpec], he_init: bool = False
) -> Tuple[MLP, Tuple[FCSpec, ...]]:
    rng = np.random.default_rng(seed)
    n_classes = specs[-1].out_dim
    return (
        MLP(tuple(fc_init(rng, s, n_classes, he_init) for s in specs)),
        tuple(specs),
    )


def mlp_forward(model: MLP, specs, x):
    """Returns (final_out, per-layer (out, grad_inv) caches)."""
    caches = []
    h = x
    for p, s in zip(model.params, specs):
        out, gi, bn = fc_forward(p, h, s)
        caches.append((h, out, gi, bn))
        h = out
    return h, caches


def dfa_train_step(
    model: MLP, specs, x, y, lr_inv: int, lo: int = -127, hi: int = 128
) -> Tuple[MLP, jnp.ndarray]:
    """One integer-DFA minibatch update (reference pktfc::backward +
    computeDeltas, pktnn_fc.cpp:180-343). x [B,in] int32, y [B,n_classes]."""
    y_hat, caches = mlp_forward(model, specs, x)
    loss_delta = batch_l2_loss_delta(y, y_hat)  # [B, n_classes]
    n_layers = len(model.params)
    n_items = x.shape[0]
    # deltas, last layer backwards (BP layers need the next layer's deltas:
    # reference computeDeltas, pktnn_fc.cpp:241-343)
    deltas_list = [None] * n_layers
    bn_grads = [None] * n_layers  # (dGamma, dBeta) for BN layers
    for li in range(n_layers - 1, -1, -1):
        p, s = model.params[li], specs[li]
        gi = caches[li][2]
        if s.use_bn:
            # BN branch (pktnn_fc.cpp:244-302): upstream gradient is vanilla
            # BP from the next layer even in DFA mode
            if li == n_layers - 1:
                d_bn = div_trunc(loss_delta, gi)
            else:
                nxt = model.params[li + 1].weight
                d_bn = div_trunc(deltas_list[li + 1] @ nxt.T, gi)
            xhat, stdev = caches[li][3]
            d_gamma = (d_bn * xhat).sum(axis=0, keepdims=True)
            d_beta = d_bn.sum(axis=0, keepdims=True)
            bn_grads[li] = (d_gamma, d_beta)
            gamma_stdev = div_trunc(p.gamma, stdev)  # (1, out)
            deltas_list[li] = div_trunc(
                (-d_gamma * xhat + d_bn * n_items - d_beta) * gamma_stdev,
                n_items,
            )
        elif li == n_layers - 1:
            deltas_list[li] = div_trunc(loss_delta, gi)
        elif s.use_dfa:
            deltas_list[li] = div_trunc(loss_delta @ p.dfa, gi)
        else:  # vanilla backprop through the next layer's weights
            nxt = model.params[li + 1].weight
            deltas_list[li] = div_trunc(deltas_list[li + 1] @ nxt.T, gi)
    new_params = []
    for li, (p, s) in enumerate(zip(model.params, specs)):
        x_in, _, gi = caches[li][:3]
        deltas = deltas_list[li]
        wu = div_trunc(x_in.T @ deltas, -lr_inv)
        if s.use_bn:
            # gamma/beta updated instead of the bias; no clamp on them
            # (pktnn_fc.cpp:209-217)
            d_gamma, d_beta = bn_grads[li]
            new_params.append(
                FCParams(
                    jnp.clip(p.weight + wu, lo, hi),
                    p.bias,
                    p.dfa,
                    p.gamma + div_trunc(d_gamma, -lr_inv),
                    p.beta + div_trunc(d_beta, -lr_inv),
                )
            )
            continue
        bu = div_trunc(
            jnp.ones((1, x_in.shape[0]), jnp.int32) @ deltas, -lr_inv
        )
        new_params.append(
            FCParams(
                jnp.clip(p.weight + wu, lo, hi),
                jnp.clip(p.bias + bu, lo, hi),
                p.dfa,
            )
        )
    loss = batch_l2_loss(y, y_hat)
    return MLP(tuple(new_params)), loss


# ---------------------------------------------------------------------------
# Weight CSV IO (compatible with reference weights/ assets, matrix.h:134-159)
# ---------------------------------------------------------------------------


def read_csv_matrix(path) -> np.ndarray:
    rows = []
    with open(path) as f:
        for line in f:
            vals = [v for v in line.strip().split(",") if v.strip() != ""]
            if vals:
                rows.append([int(float(v)) for v in vals])
    return np.asarray(rows, np.int64)


def save_csv_matrix(path, mat: np.ndarray):
    mat = np.asarray(mat)
    with open(path, "w") as f:
        for row in np.atleast_2d(mat):
            f.write(",".join(str(int(v)) for v in row) + ",\n")


# ---------------------------------------------------------------------------
# Integer convolution (reference pktmat3d conv scaffolding,
# libs/pocketnn/.../pktnn_mat3d — 3D int matrices + valid-window products;
# never used by a reference workload, provided for completeness)
# ---------------------------------------------------------------------------


class ConvSpec(NamedTuple):
    """Integer conv layer: kernel [out_ch, in_ch, k, k], valid padding."""

    in_ch: int
    out_ch: int
    ksize: int
    stride: int = 1
    actv: str = "as_is"


def conv_init(key, spec: ConvSpec, bound: int = 2) -> jnp.ndarray:
    """Small random integer kernels in [-bound, bound] (the reference's conv
    weights come from QAT CSVs; this is the training-scaffold init)."""
    return jax.random.randint(
        key,
        (spec.out_ch, spec.in_ch, spec.ksize, spec.ksize),
        -bound,
        bound + 1,
        jnp.int32,
    )


def conv2d_int_jax(x: jnp.ndarray, kernel: jnp.ndarray, stride: int) -> jnp.ndarray:
    """Exact int32 valid conv on device: x [B, Ci, H, W], kernel
    [Co, Ci, Kh, Kw] -> [B, Co, OH, OW].  Lowered via lax.conv_general_dilated
    with an int32 accumulator so XLA tiles it onto the MXU (integer matmul
    units) instead of a scalar loop — the TPU-native form of the reference's
    per-window tensordot (pktnn_mat3d)."""
    return jax.lax.conv_general_dilated(
        x.astype(jnp.int32),
        kernel.astype(jnp.int32),
        window_strides=(stride, stride),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        preferred_element_type=jnp.int32,
    )


def conv_forward(kernel: jnp.ndarray, x: jnp.ndarray, spec: ConvSpec):
    """actv(conv(x, kernel)) with the PocketNN activation table; returns
    (out, grad_inv) like fc_forward."""
    inter = conv2d_int_jax(x, kernel, spec.stride)
    fan_in = spec.in_ch * spec.ksize * spec.ksize
    return ACTIVATIONS[spec.actv](inter, K_BIT, fan_in)
