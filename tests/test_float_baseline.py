"""Float baselines + the float/integer/encrypted accuracy parity report
(reference notebooks SpO2.ipynb / mnist_hhe_plain.ipynb; report format
hhe_pktnn_examples.cpp:338-361)."""

import os

import numpy as np
import pytest

from hhe_tpu.workloads import float_baseline as fb

ASSETS = os.path.exists(fb.SIESTA_ROOT)


@pytest.mark.skipif(not ASSETS, reason="reference assets unavailable")
def test_load_siesta():
    x, y = fb.load_siesta(limit_patients=3)
    assert x.shape[1] == 300 and len(x) == len(y)
    assert set(np.unique(y)) <= {0, 1}


@pytest.mark.skipif(not ASSETS, reason="reference assets unavailable")
def test_float_spo2_beats_majority():
    x, y = fb.load_siesta(limit_patients=20)
    majority = max(np.mean(y), 1 - np.mean(y))
    res = fb.train_float_spo2(limit_patients=20, epochs=30)
    assert res.test_acc >= majority - 0.02, (res.test_acc, majority)


def test_float_mnist_2fc_trains():
    res = fb.train_float_mnist_2fc(epochs=2, train_limit=3000)
    assert res.test_acc > 0.8, res.test_acc


@pytest.mark.slow
@pytest.mark.skipif(not ASSETS, reason="reference assets unavailable")
def test_accuracy_parity_report():
    """The report carries all three columns and the encrypted column is
    anchored by a hard parity check through the real HHE pipeline."""
    rep = fb.accuracy_parity_report(
        limit_patients=10, mnist_limit=500, encrypted_samples=1
    )
    for model in ("spo2_1fc", "mnist_2fc"):
        for col in ("float", "integer", "encrypted"):
            assert 0.0 <= rep[model][col] <= 1.0
        assert rep[model]["encrypted"] == rep[model]["integer"]
    assert rep["spo2_1fc"]["encrypted_parity_checked_samples"] == 1.0
