"""QAT subsystem: trains a 2-bit 2FC square-activation model and exports
integer weights the encrypted pipeline can evaluate (reference qat/)."""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

from hhe_tpu.models import loaders, pocketnn as pk
from hhe_tpu.workloads import qat


def test_train_quant_2fc_and_export(tmp_path):
    x, y = loaders.load_mnist_test(limit=3000)  # already 2-bit quantized
    res = qat.train_quant_2fc(
        x[:2500], y[:2500], x[2500:], y[2500:],
        hidden=64, epochs=6,
        export_prefix=str(tmp_path / "quant_2fc_2bits_test"),
    )
    assert res.w1_int.min() >= -1 and res.w1_int.max() <= 1  # 2-bit ternary
    assert res.int_acc > 0.7, (res.int_acc, res.float_acc)
    w1 = pk.read_csv_matrix(tmp_path / "quant_2fc_2bits_test_fc1.csv")
    assert w1.shape == (784, 64)
    assert np.array_equal(w1, res.w1_int)


@pytest.mark.slow
def test_train_quant_2fc_reference_scale():
    """Reference-scale QAT from scratch: >=80% integer accuracy — the bar
    the shipped reference weights meet (see test below).

    Scale note: the reference trains on the 60k MNIST train split fetched
    by torchvision (``qat/src/mnist.py:20-32``); this environment has zero
    egress and the reference repo ships only the test split (no
    ``train-images-idx3-ubyte`` under ``data/mnist/MNIST/raw``), so
    reference scale here = the full shipped corpus: train on 9k of the
    10k test images, evaluate on the held-out 1k."""
    x, y = loaders.load_mnist_test()  # full shipped corpus
    res = qat.train_quant_2fc(
        x[:9000], y[:9000], x[9000:], y[9000:], hidden=128, epochs=10, seed=0
    )
    assert res.int_acc >= 0.8, (res.int_acc, res.float_acc)


def _siesta_splits():
    from hhe_tpu.workloads import float_baseline as fb

    x, y = fb.load_siesta()
    n = len(x)
    i1, i2 = int(n * 0.6), int(n * 0.8)  # notebook's sequential 60/20/20
    return x, y, x[:i1], y[:i1], x[i2:], y[i2:]


def test_train_quant_spo2_1fc_and_export(tmp_path):
    """SpO2 QAT trainer (reference notebooks/SpO2_qat.ipynb): short run on
    the shipped SIESTA corpus beats the majority class, exports the shipped
    CSV format (one int per line, 300 lines, 2-bit ternary)."""
    import os

    from hhe_tpu.workloads import float_baseline as fb

    if not os.path.exists(fb.SIESTA_ROOT):
        pytest.skip("reference assets unavailable")
    x, y, xtr, ytr, xte, yte = _siesta_splits()
    majority = max(np.mean(yte), 1 - np.mean(yte))
    out = str(tmp_path / "quant_fc_5bits_data_2bits_weights.csv")
    res = qat.train_quant_spo2_1fc(
        xtr, ytr, xte, yte, weight_bits=2, epochs=10, export_path=out
    )
    assert res.w_int.min() >= -1 and res.w_int.max() <= 1  # 2-bit ternary
    assert res.int_acc > majority, (res.int_acc, majority)
    back = pk.read_csv_matrix(out)
    assert back.shape == (300, 1)
    assert np.array_equal(back.reshape(-1), res.w_int)
    # the shipped CSVs parse identically through the same reader
    shipped = pk.read_csv_matrix(
        "/root/reference/weights/SpO2/qat/quant_fc_5bits_data_2bits_weights.csv"
    )
    assert shipped.shape == back.shape


@pytest.mark.slow
def test_train_quant_spo2_reference_scale():
    """From-scratch SpO2 QAT at full shipped-corpus scale matches the
    shipped model's accuracy class (shipped 2-bit: 0.749 on the sequential
    test split / 0.822 full corpus; measured from
    weights/SpO2/qat/quant_fc_5bits_data_2bits_weights.csv)."""
    import os

    from hhe_tpu.workloads import float_baseline as fb

    if not os.path.exists(fb.SIESTA_ROOT):
        pytest.skip("reference assets unavailable")
    x, y, xtr, ytr, xte, yte = _siesta_splits()
    res = qat.train_quant_spo2_1fc(xtr, ytr, xte, yte, weight_bits=2, epochs=60)
    assert res.int_acc >= 0.73, res.int_acc
    full = float(np.mean(((x.astype(np.int64) @ res.w_int) > 0).astype(int) == y))
    assert full >= 0.81, full


def test_shipped_qat_weights_integer_accuracy():
    """The reference's shipped 2-bit QAT MNIST model evaluated with pure
    integer math (the mod-free version of what the encrypted 2FC computes)."""
    w1 = pk.read_csv_matrix(
        "/root/reference/weights/mnist/qat/quant_2fc_2bits_mnist_plain_2bits_weights_fc1.csv"
    )
    w2 = pk.read_csv_matrix(
        "/root/reference/weights/mnist/qat/quant_2fc_2bits_mnist_plain_2bits_weights_fc2.csv"
    )
    x, y = loaders.load_mnist_test(limit=2000)
    v1 = x.astype(np.int64) @ w1
    logits = (v1 * v1) @ w2
    acc = float(np.mean(logits.argmax(1) == y))
    assert acc > 0.8, acc
