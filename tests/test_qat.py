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
    assert res.int_acc > 0.5, (res.int_acc, res.float_acc)
    w1 = pk.read_csv_matrix(tmp_path / "quant_2fc_2bits_test_fc1.csv")
    assert w1.shape == (784, 64)
    assert np.array_equal(w1, res.w1_int)


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
