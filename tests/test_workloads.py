"""End-to-end HHE inference workload tests on a small-but-complete parameter
set (N=2048 with a widened modulus chain so the full 3-round transcipher fits
the noise budget; production config N=16384 is covered by the slow test in
test_transcipher.py)."""

import numpy as np
import pytest

from hhe_tpu.ops import bfv
from hhe_tpu.workloads import hhe_inference as wk


@pytest.fixture(scope="module")
def stack300():
    return wk.build_stack(bfv.BFVParams(n=1024, data_limbs=13, seed=42), input_len=300)


def test_hhe_1fc_inference_parity(stack300):
    """Full SpO2-style 300-length pipeline with the hard plaintext-parity
    check (reference hhe_pktnn_examples.cpp:385-711)."""
    rng = np.random.default_rng(0)
    w = rng.integers(-3, 4, 300)
    x = rng.integers(0, 32, (2, 300))
    out = wk.hhe_1fc_inference(stack300, w, x, check_parity=True)
    expect_raw = x.astype(np.int64) @ w
    assert np.array_equal(out["raw"], expect_raw)
    assert np.array_equal(out["predictions"], (expect_raw > 0).astype(int))


def test_hhe_2fc_inference():
    """Encrypted 2FC (fc1 ct x ct batched rows -> square -> packed fc2) with
    mod-t parity — the path the reference left as TODO
    (hhe_pktnn_examples.cpp:993-997). Transcipher-free input encryption."""
    stack = wk.build_stack(bfv.BFVParams(n=2048, data_limbs=5, seed=3), input_len=128)
    rng = np.random.default_rng(2)
    in_dim, R = 784, 32
    w1 = rng.integers(-1, 2, (in_dim, R)) * (rng.random((in_dim, R)) < 0.05)
    w2 = rng.integers(-2, 3, (R, 10))
    x = (rng.random((2, in_dim)) < 0.1).astype(np.int64)
    out = wk.hhe_2fc_inference(
        stack, w1, w2, x, via_transcipher=False, check_parity=True
    )
    v1 = x @ w1
    expect = np.argmax((v1 * v1) @ w2, axis=1)
    assert np.array_equal(out["predictions"], expect)


def test_hhe_1fc_real_spo2_assets(stack300):
    """Full pipeline on the reference's real assets: SIESTA SpO2 recording +
    shipped quantized weights (config.cpp:66), hard parity check."""
    import os

    from hhe_tpu.models import loaders, pocketnn as pknn

    wpath = "/root/reference/weights/SpO2/qat/quant_fc_5bits_data_2bits_weights.csv"
    if not os.path.exists(wpath):
        pytest.skip("reference assets unavailable")
    data = loaders.load_spo2_recording()[:2]
    w = pknn.read_csv_matrix(wpath).reshape(-1)
    out = wk.hhe_1fc_inference(stack300, w, data, check_parity=True)
    expect = data.astype(np.int64) @ w
    assert np.array_equal(out["raw"], expect)
    assert set(np.unique(out["predictions"])) <= {0, 1}


def test_hhe_1fc_qat_trained_weights(stack300, tmp_path):
    """SpO2 QAT closed loop (VERDICT round-3 item 7): weights trained FROM
    SCRATCH by workloads.qat.train_quant_spo2_1fc on the shipped SIESTA
    corpus, exported in the shipped CSV format, re-loaded and run through
    the real-asset 1FC HHE pipeline with the hard parity check — the same
    consumption path as the shipped ``weights/SpO2/qat`` artifacts
    (reference notebooks/SpO2_qat.ipynb -> configs/config.cpp:66)."""
    import os

    pytest.importorskip("torch")
    from hhe_tpu.models import loaders, pocketnn as pknn
    from hhe_tpu.workloads import float_baseline as fb, qat

    if not os.path.exists(fb.SIESTA_ROOT):
        pytest.skip("reference assets unavailable")
    x, y = fb.load_siesta(limit_patients=30)
    out_csv = str(tmp_path / "quant_fc_5bits_data_2bits_weights.csv")
    qat.train_quant_spo2_1fc(
        x, y, x[:64], y[:64], weight_bits=2, epochs=2, export_path=out_csv
    )  # parity does not depend on accuracy; 2 epochs keeps the test fast
    data = loaders.load_spo2_recording()[:2]
    w = pknn.read_csv_matrix(out_csv).reshape(-1)
    out = wk.hhe_1fc_inference(stack300, w, data, check_parity=True)
    expect = data.astype(np.int64) @ w
    assert np.array_equal(out["raw"], expect)


def test_hhe_fmnist_shipped_weights():
    """The reference's `fmnist` dataset switch (hhe_pktnn_examples.h:86-88)
    on its SHIPPED FashionMNIST one-layer model: the 784x10 weight + bias
    CSVs through the encrypted per-class product + rotate-sum + bias eval
    with the hard mod-t parity check (direct BFV input encryption — the
    full transcipher path is the slow-marked twin below).  Images are not
    shipped (labels only) — surrogate inputs, documented in the workload
    docstring."""
    import os

    if not os.path.exists(wk.FMNIST_WEIGHT_CSV):
        pytest.skip("reference assets unavailable")
    stack = wk.build_stack(bfv.BFVParams(n=2048, data_limbs=5, seed=7), input_len=784)
    out = wk.hhe_fmnist_1fc_inference(
        stack, batch=2, via_transcipher=False, check_parity=True
    )
    assert out["logits"].shape == (2, 10)
    assert out["predictions"].shape == (2,)
    rep = out["report"]
    for party in ("analyst", "user", "csp", "total"):
        assert rep["computation_ms"][party] > 0.0, party


@pytest.mark.slow
def test_hhe_fmnist_shipped_weights_full_transcipher():
    """Slow twin of test_hhe_fmnist_shipped_weights: the SAME shipped
    FashionMNIST weights through the FULL pipeline — PASTA encrypt ->
    transcipher (7 blocks) -> mask+flatten -> encrypted per-class FC ->
    analyst decrypt — with the hard mod-t parity check."""
    import os

    if not os.path.exists(wk.FMNIST_WEIGHT_CSV):
        pytest.skip("reference assets unavailable")
    stack = wk.build_stack(bfv.BFVParams(n=2048, data_limbs=13, seed=7), input_len=784)
    out = wk.hhe_fmnist_1fc_inference(stack, batch=2, check_parity=True)
    assert out["logits"].shape == (2, 10)


def test_hhe_ecg_inference(stack300):
    """ECG-style single-block pipeline: host sum + simple_pocket_sigmoid."""
    from hhe_tpu.models import pocketnn as pk

    rng = np.random.default_rng(1)
    w = rng.integers(-2, 3, 128)
    x = rng.integers(0, 64, (2, 128))
    out = wk.hhe_ecg_inference(stack300, w, x)
    sums = (x.astype(np.int64) * w).sum(1)
    expect = [128 if int(pk.simple_pocket_sigmoid(int(s))) > 64 else 0 for s in sums]
    assert out["predictions"].tolist() == expect


def test_hhe_ecg_full_asset_scale(stack300):
    """Reference full-dataset ECG benchmark (hhe_pktnn_examples.cpp:63-383)
    at the scale the shipped assets allow: sized from the shipped 13,245-row
    MIT-BIH label file, surrogate inputs documented (the reference's
    mitbih_x_test_int.csv is not shipped), dry_run-capped here; asserts the
    experiment report carries the reference's closing-block fields."""
    import os

    from hhe_tpu.models import loaders
    from hhe_tpu.utils.config import RunConfig

    if not os.path.exists(loaders.MITBIH_ROOT):
        pytest.skip("reference assets unavailable")
    assert len(loaders.load_mitbih_labels("test")) == 13245  # reference scale
    run = RunConfig(dry_run=True, dry_run_num_samples=3)
    out = wk.hhe_ecg_full_inference(stack300, run=run, batch=2)
    assert out["agreement"] == 1.0  # encrypted == plaintext, all samples
    rep = out["report"]
    assert rep["samples"] == 3
    for party in ("analyst", "user", "csp", "total"):
        assert rep["computation_ms"][party] > 0.0, party
    for edge in ("analyst-user", "user-csp", "analyst-csp", "total"):
        assert rep["communication_mb"][edge] > 0.0, edge
    assert "not meaningful" in rep["label_accuracy_note"]


def test_run_config_dry_run_and_debugging(stack300, capsys):
    """RunConfig wiring (reference configs/config.cpp:9-12): dry_run caps the
    processed sample count at dry_run_num_samples; debugging prints per-stage
    noise-budget telemetry (reference debug path pasta_3_seal.cpp:73)."""
    from hhe_tpu.utils.config import RunConfig

    rng = np.random.default_rng(5)
    w = rng.integers(-2, 3, 128)
    x = rng.integers(0, 64, (5, 128))
    run = RunConfig(dry_run=True, dry_run_num_samples=2, debugging=True)
    out = wk.hhe_ecg_inference(stack300, w, x, run=run)
    assert len(out["predictions"]) == 2  # capped by dry_run
    logs = capsys.readouterr().out
    assert "noise budget after decomposition" in logs
    assert "noise budget after encrypted weight product" in logs

    # dry_run off: full batch, no telemetry
    run = RunConfig(dry_run=False, debugging=False)
    out = wk.hhe_ecg_inference(stack300, w, x, run=run)
    assert len(out["predictions"]) == 5
    assert "noise budget" not in capsys.readouterr().out


def test_run_config_limits_training():
    from hhe_tpu.utils.config import RunConfig
    from hhe_tpu.workloads import training as tr

    rng = np.random.default_rng(0)
    x = rng.integers(0, 4, (40, 16))
    y = rng.integers(0, 2, 40)
    run = RunConfig(dry_run=True, dry_run_num_samples=8)
    res = tr.train_ecg_one_layer(x, y, epochs=1, mini_batch=4, run=run)
    # 8 samples / minibatch 4 => exactly 2 minibatches contributed to loss
    assert len(res.history) == 1
