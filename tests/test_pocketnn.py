"""Integer NN (PocketNN-equivalent) semantics tests."""

import numpy as np
import jax
import jax.numpy as jnp

from hhe_tpu.models import pocketnn as pk


def test_div_trunc_matches_c():
    a = jnp.asarray([-7, -5, -1, 0, 1, 5, 7], jnp.int32)
    # C: -7/2 == -3 (truncation toward zero), numpy // would give -4
    got = np.asarray(pk.div_trunc(a, 2))
    assert got.tolist() == [-3, -2, 0, 0, 0, 2, 3]
    got = np.asarray(pk.div_trunc(a, -2))
    assert got.tolist() == [3, 2, 0, 0, 0, -2, -3]


def test_pocket_sigmoid_values():
    # x/(2^8) then piecewise (pktnn_actv.cpp comments)
    x = jnp.asarray([-200 * 256, -100 * 256, -50 * 256, 0, 10 * 256, 50 * 256, 100 * 256, 200 * 256])
    out, gi = pk.pocket_sigmoid(x)
    # segments: <-127 -> 1; -100/8+20=8 (trunc -12+20); -50/2+48=23; 0+64;
    # 10+64=74; 50/2+80=105; 100/8+108=120 (12+108); >=128 -> 127
    assert np.asarray(out).tolist() == [1, 8, 23, 64, 74, 105, 120, 127]
    assert np.asarray(gi).tolist() == [127, 8, 2, 1, 1, 2, 8, 127]


def test_pocket_tanh_fan_in():
    # divisor = 256 * fan_in
    x = jnp.asarray([256 * 4 * 10])
    out, _ = pk.pocket_tanh(x, fan_in=4)
    assert np.asarray(out).tolist() == [2 * 10]


def test_simple_pocket_sigmoid_and_int_sigmoid():
    xs = [-200, -100, -50, 0, 10, 50, 100, 200]
    got = [int(pk.simple_pocket_sigmoid(x)) for x in xs]
    assert got == [1, 8, 23, 64, 74, 105, 120, 127]
    assert [int(pk.int_sigmoid(x)) for x in (-5, 0, 3)] == [0, 0, 1]


def test_square_activation():
    out, gi = pk.square(jnp.asarray([-3, 0, 5]))
    assert np.asarray(out).tolist() == [9, 0, 25]
    assert np.asarray(gi).tolist() == [-6, 0, 10]


def test_dfa_training_learns():
    """Integer DFA on a linearly separable toy problem reduces loss and fits
    (reference fc_int_bp_simple / fc_int_dfa_* training loops)."""
    rng = np.random.default_rng(0)
    n, d = 128, 16
    x = rng.integers(-40, 40, (n, d)).astype(np.int32)
    w_true = rng.integers(-3, 4, (d, 1)).astype(np.int32)
    labels = (x @ w_true > 0).astype(np.int32)
    y = labels * 128  # match reference label scaling (labels * 128)

    specs = [pk.FCSpec(d, 1, "pocket_sigmoid", use_dfa=True)]
    model, specs = pk.mlp_init(1, specs)
    xj, yj = jnp.asarray(x), jnp.asarray(y)
    first_loss = last_loss = None
    for epoch in range(20):
        total = 0.0
        for i in range(0, n, 4):  # minibatch 4, reference config.cpp:30
            model, loss = pk.dfa_train_step(model, specs, xj[i : i + 4], yj[i : i + 4], lr_inv=50)
            total += float(loss)
        if first_loss is None:
            first_loss = total
        last_loss = total
    out, _ = pk.mlp_forward(model, specs, xj)
    acc = float(np.mean((np.asarray(out)[:, 0] > 64) == (labels[:, 0] > 0)))
    assert last_loss < first_loss
    assert acc > 0.8, acc


def test_csv_roundtrip(tmp_path):
    m = np.array([[1, -2, 3], [4, 5, -6]])
    p = tmp_path / "w.csv"
    pk.save_csv_matrix(p, m)
    assert np.array_equal(pk.read_csv_matrix(p), m)


def test_reference_weight_loading():
    """Shipped quantized SpO2 weights load with the expected shape
    (reference weights/SpO2/qat/..., config.cpp:66)."""
    import pathlib

    ref = pathlib.Path("/root/reference/weights/SpO2/qat/quant_fc_5bits_data_2bits_weights.csv")
    if not ref.exists():
        import pytest

        pytest.skip("reference assets unavailable")
    w = pk.read_csv_matrix(ref)
    assert w.shape == (300, 1)
    assert w.min() >= -127 and w.max() <= 128


def test_pocket_softmax():
    x = jnp.asarray([[-5, 0, 10, 30]], jnp.int32)
    out, gi = pk.pocket_softmax(x)
    assert np.asarray(out)[0, 0] == 0 and np.asarray(out)[0, 1] == 0
    scale = pk.INT_MAX // 40
    assert np.asarray(out)[0, 2] == 10 * scale
    assert np.asarray(gi)[0, 0] == pk.INT_MAX and np.asarray(gi)[0, 3] == 1


def test_pocket_cross_loss():
    y = np.zeros((2, 3), np.int64)
    y[0, 1] = pk.INT_MAX
    y[1, 2] = pk.INT_MAX
    yh = jnp.asarray([[1, 5, 2], [0, 0, 7]], jnp.int32)
    got = float(pk.batch_pocket_cross_loss(jnp.asarray(y), yh))
    expect = float(pk.INT_MAX - 5) + float(pk.INT_MAX - 7)
    assert abs(got - expect) <= 1024  # float32 accumulator granularity
    d = np.asarray(pk.batch_pocket_cross_loss_delta(jnp.asarray(y), yh))
    assert d[0, 1] == -1 and d[1, 2] == -1 and d[0, 0] == 0


def test_backprop_mode_learns():
    """Vanilla BP (use_dfa=False for hidden layer) on the toy task
    (reference fc_int_bp_simple, pktnn_examples.cpp:5-62)."""
    rng = np.random.default_rng(4)
    n, d = 128, 8
    x = rng.integers(-20, 20, (n, d)).astype(np.int32)
    w_true = rng.integers(-3, 4, (d, 1)).astype(np.int32)
    y = ((x @ w_true > 0) * 128).astype(np.int32)
    specs = [
        pk.FCSpec(d, 8, "pocket_tanh", use_dfa=False),
        pk.FCSpec(8, 1, "pocket_sigmoid", use_dfa=False),
    ]
    model, specs = pk.mlp_init(2, specs, he_init=True)
    first = last = None
    for _ in range(15):
        total = 0.0
        for i in range(0, n, 4):
            model, loss = pk.dfa_train_step(
                model, specs, jnp.asarray(x[i : i + 4]), jnp.asarray(y[i : i + 4]), 50
            )
            total += float(loss)
        first = total if first is None else first
        last = total
    assert last < first


def test_batch_norm_bit_exact_vs_reference():
    """Integer batch-norm forward + 3 training steps, bit-exact against the
    compiled reference PocketNN library (pktfc::batchNormalization,
    pktnn_fc.cpp:345-427; BN branch of computeDeltas :244-302; golden vectors
    from tools/pktnn_probe-style harness, see git history)."""
    N, IN, OUT, LRINV = 5, 6, 4, 10
    x = np.array(
        [[((r * 11 + c * 5) % 19) - 9 for c in range(IN)] for r in range(N)],
        np.int32,
    )
    w0 = np.array(
        [[((r * 7 + c * 13) % 21) - 10 for c in range(OUT)] for r in range(IN)],
        np.int32,
    )
    target = np.array(
        [[((r + c) % 2) * 100 for c in range(OUT)] for r in range(N)], np.int32
    )

    specs = [pk.FCSpec(IN, OUT, "pocket_tanh", use_dfa=True, use_bn=True)]
    model, specs = pk.mlp_init(0, specs)
    model = pk.MLP((model.params[0]._replace(weight=jnp.asarray(w0)),))
    xj, yj = jnp.asarray(x), jnp.asarray(target)

    out0, _ = pk.mlp_forward(model, specs, xj)
    assert np.asarray(out0).tolist() == np.zeros((N, OUT)).tolist()

    for _ in range(3):
        model, _ = pk.dfa_train_step(model, specs, xj, yj, lr_inv=LRINV)

    out3, _ = pk.mlp_forward(model, specs, xj)
    golden_out3 = [
        [-58, 127, -10, -114],
        [-60, -127, -10, 127],
        [-60, 127, -10, -108],
        [127, -52, 86, 26],
        [-127, -87, -67, 50],
    ]
    golden_w3 = [
        [-127, 128, -127, -127],
        [128, 128, 128, -127],
        [128, -127, 128, 128],
        [-127, -127, -127, 128],
        [-127, 128, -127, -127],
        [128, 128, 128, -127],
    ]
    assert np.asarray(out3).tolist() == golden_out3
    assert np.asarray(model.params[0].weight).tolist() == golden_w3
    assert np.asarray(model.params[0].gamma).tolist() == [[-1829, -2418, -356, -1111]]
    assert np.asarray(model.params[0].beta).tolist() == [[31, 46, 49, 45]]


def test_floor_isqrt():
    x = jnp.asarray([0, 1, 2, 3, 4, 15, 16, 17, 2**30, 2**31 - 1], jnp.int32)
    got = np.asarray(pk.floor_isqrt(x)).tolist()
    import math

    assert got == [math.isqrt(int(v)) for v in np.asarray(x)]


def test_conv2d_int_jax_matches_host_reference():
    """pktmat3d-equivalent integer conv: the device lowering is exact vs the
    host per-window tensordot (ops.heconv.conv2d_int)."""
    from hhe_tpu.ops import heconv

    rng = np.random.default_rng(0)
    x = rng.integers(-8, 9, (3, 13, 11))
    k = rng.integers(-4, 5, (5, 3, 3, 3))
    for stride in (1, 2):
        want = heconv.conv2d_int(x, k, stride)
        got = np.asarray(pk.conv2d_int_jax(jnp.asarray(x[None]), jnp.asarray(k), stride))[0]
        assert np.array_equal(got, want), stride


def test_conv_forward_square_activation():
    rng = np.random.default_rng(1)
    spec = pk.ConvSpec(in_ch=1, out_ch=2, ksize=5, stride=2, actv="square")
    kern = pk.conv_init(jax.random.PRNGKey(0), spec)
    x = jnp.asarray(rng.integers(0, 4, (2, 1, 28, 28)), jnp.int32)
    out, gi = pk.conv_forward(kern, x, spec)
    raw = pk.conv2d_int_jax(x, kern, 2)
    want, _ = pk.square(raw, pk.K_BIT, 25)
    assert np.array_equal(np.asarray(out), np.asarray(want))
    assert out.shape == (2, 2, 12, 12)
