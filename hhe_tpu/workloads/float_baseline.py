"""Float baseline models + float/integer/encrypted accuracy parity report.

TPU-native equivalent of the reference's float notebooks
(``notebooks/SpO2.ipynb``, ``notebooks/float_mitbih.ipynb``,
``notebooks/mnist_hhe_plain.ipynb``): the float accuracies anchor the
integer (PocketNN/QAT) and encrypted pipelines, reported side by side the
way the reference prints encrypted-vs-plaintext accuracy
(``hhe_pktnn_examples.cpp:338-361``).

Models (JAX/optax, jit-compiled):
- SpO2: logistic regression 300 -> 1 on the SIESTA recording-wise dataset
  (the real asset under ``data/Harpocrates_recordingwise_SIESTA_4percent``).
- MNIST: float 2FC 784 -> R -> square -> 10 (same architecture the QAT
  2-bit model quantizes, ``qat/src/mnist.py``).
"""

from __future__ import annotations

import dataclasses
import glob
import os
from typing import Dict, Optional, Tuple

import numpy as np
import jax
import jax.numpy as jnp
import optax

SIESTA_ROOT = "/root/reference/data/Harpocrates_recordingwise_SIESTA_4percent"


def load_siesta(
    root: str = SIESTA_ROOT, limit_patients: Optional[int] = None
) -> Tuple[np.ndarray, np.ndarray]:
    """All patients' recording rows: x [n, 300] float, y [n] in {0,1}
    (reference data layout: <patient>_data.txt + <patient>_binaryoutput.txt)."""
    xs, ys = [], []
    files = sorted(glob.glob(os.path.join(root, "*_data.txt")))
    if limit_patients is not None:
        files = files[:limit_patients]
    for f in files:
        x = np.loadtxt(f, delimiter=",", ndmin=2)
        y = np.loadtxt(f.replace("_data.txt", "_binaryoutput.txt"), ndmin=1)
        n = min(len(x), len(y))
        xs.append(x[:n])
        ys.append(y[:n])
    return np.concatenate(xs), np.concatenate(ys).astype(np.int64)


def _split(x, y, test_frac=0.2, seed=0):
    rng = np.random.default_rng(seed)
    idx = rng.permutation(len(x))
    n_test = int(len(x) * test_frac)
    te, tr = idx[:n_test], idx[n_test:]
    return x[tr], y[tr], x[te], y[te]


@dataclasses.dataclass
class FloatResult:
    train_acc: float
    test_acc: float
    params: tuple


def train_float_spo2(
    limit_patients: Optional[int] = 40,
    epochs: int = 400,
    lr: float = 0.02,
    seed: int = 0,
) -> FloatResult:
    """Float logistic regression on SIESTA SpO2 (reference SpO2.ipynb)."""
    x, y = load_siesta(limit_patients=limit_patients)
    # standardize like the notebook pipelines do for float training
    mu, sd = x.mean(0), x.std(0) + 1e-6
    xs = (x - mu) / sd
    xtr, ytr, xte, yte = _split(xs, y, seed=seed)
    params = (jnp.zeros((xtr.shape[1],), jnp.float32), jnp.zeros((), jnp.float32))
    xtr_j, ytr_j = jnp.asarray(xtr, jnp.float32), jnp.asarray(ytr, jnp.float32)

    def loss_fn(params, xb, yb):
        w, b = params
        logits = xb @ w + b
        return jnp.mean(
            jnp.maximum(logits, 0) - logits * yb + jnp.log1p(jnp.exp(-jnp.abs(logits)))
        )

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(params, opt_state, xb, yb):
        g = jax.grad(loss_fn)(params, xb, yb)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(params, up), opt_state

    for _ in range(epochs):  # full-batch Adam steps
        params, opt_state = step(params, opt_state, xtr_j, ytr_j)

    def acc(params, xa, ya):
        preds = np.asarray(jnp.asarray(xa, jnp.float32) @ params[0] + params[1]) > 0
        return float(np.mean(preds == (ya > 0)))

    return FloatResult(acc(params, xtr, ytr), acc(params, xte, yte), params)


def train_float_mnist_2fc(
    hidden: int = 128,
    epochs: int = 3,
    batch: int = 128,
    lr: float = 1e-3,
    train_limit: Optional[int] = 8000,
    seed: int = 0,
) -> FloatResult:
    """Float 784 -> hidden -> square -> 10 (the QAT model's float twin,
    reference qat/src/mnist.py SquareAct architecture)."""
    from ..models import loaders

    # the environment ships only the MNIST test split as a real asset;
    # train on its head and evaluate on its tail (documented subset)
    x_all, y_all = loaders.load_mnist_test(limit=None, quantize=False)
    x_all = x_all.astype(np.float32) / 255.0
    n_train = min(train_limit or len(x_all) - 2000, len(x_all) - 2000)
    xtr, ytr = x_all[:n_train], y_all[:n_train]
    xte, yte = x_all[-2000:], y_all[-2000:]

    rng = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(rng)
    params = (
        jax.random.normal(k1, (784, hidden)) * 0.05,
        jnp.zeros((hidden,)),
        jax.random.normal(k2, (hidden, 10)) * 0.05,
        jnp.zeros((10,)),
    )

    def logits_fn(p, xb):
        w1, b1, w2, b2 = p
        h = xb @ w1 + b1
        return (h * h) @ w2 + b2

    def loss_fn(p, xb, yb):
        lg = logits_fn(p, xb)
        return -jnp.mean(
            jax.nn.log_softmax(lg)[jnp.arange(xb.shape[0]), yb]
        )

    opt = optax.adam(lr)
    opt_state = opt.init(params)

    @jax.jit
    def step(p, opt_state, xb, yb):
        g = jax.grad(loss_fn)(p, xb, yb)
        up, opt_state = opt.update(g, opt_state)
        return optax.apply_updates(p, up), opt_state

    nrng = np.random.default_rng(seed)
    for _ in range(epochs):
        order = nrng.permutation(len(xtr))
        for i in range(0, len(xtr) - batch + 1, batch):
            sel = order[i : i + batch]
            params, opt_state = step(
                params, opt_state, jnp.asarray(xtr[sel]), jnp.asarray(ytr[sel])
            )

    def acc(p, xa, ya):
        preds = np.asarray(logits_fn(p, jnp.asarray(xa))).argmax(1)
        return float(np.mean(preds == ya))

    return FloatResult(acc(params, xtr, ytr), acc(params, xte, yte), params)


# ---------------------------------------------------------------------------
# Side-by-side accuracy parity report (reference hhe_pktnn_examples.cpp:338-361)
# ---------------------------------------------------------------------------


def spo2_integer_accuracy(limit_patients: Optional[int] = 40) -> float:
    """Shipped quantized 1FC model (config.cpp:66 default weights) evaluated
    with pure integer math on the SIESTA rows — the same computation the
    encrypted pipeline performs under HE (parity-tested in
    tests/test_workloads.py)."""
    from ..models import pocketnn

    w = pocketnn.read_csv_matrix(
        "/root/reference/weights/SpO2/qat/quant_fc_5bits_data_2bits_weights.csv"
    ).reshape(-1)
    x, y = load_siesta(limit_patients=limit_patients)
    raw = x.astype(np.int64) @ w
    preds = np.asarray([int(pocketnn.int_sigmoid(int(v))) for v in raw])
    return float(np.mean(preds == y))


def mnist_integer_accuracy(limit: int = 2000) -> float:
    """Shipped 2-bit QAT 2FC model, integer math (the encrypted 2FC computes
    this bit-exactly mod t — parity-tested in bench.py / test_workloads)."""
    from ..models import loaders, pocketnn

    w1 = pocketnn.read_csv_matrix(
        "/root/reference/weights/mnist/qat/"
        "quant_2fc_2bits_mnist_plain_2bits_weights_fc1.csv"
    )
    w2 = pocketnn.read_csv_matrix(
        "/root/reference/weights/mnist/qat/"
        "quant_2fc_2bits_mnist_plain_2bits_weights_fc2.csv"
    )
    x, y = loaders.load_mnist_test(limit=limit)
    v1 = x.astype(np.int64) @ w1
    logits = (v1 * v1) @ w2
    return float(np.mean(logits.argmax(1) == y))


def accuracy_parity_report(
    limit_patients: Optional[int] = 40,
    mnist_limit: int = 2000,
    encrypted_samples: int = 2,
    stack=None,
) -> Dict[str, Dict[str, float]]:
    """Float vs integer vs encrypted, side by side.

    The encrypted column runs `encrypted_samples` real samples through the
    full HHE pipeline with the hard parity check (raises on any mismatch
    with the integer path) — establishing that encrypted accuracy == integer
    accuracy, then reports the integer accuracy for it, exactly as the
    reference equates them after its parity check
    (``hhe_pktnn_examples.cpp:692-699``)."""
    from ..models import pocketnn
    from ..ops import bfv
    from . import hhe_inference as hi

    report: Dict[str, Dict[str, float]] = {}

    f_spo2 = train_float_spo2(limit_patients=limit_patients)
    i_spo2 = spo2_integer_accuracy(limit_patients=limit_patients)
    report["spo2_1fc"] = {
        "float": f_spo2.test_acc,
        "integer": i_spo2,
        "encrypted": i_spo2,  # == integer, by parity (checked below)
    }

    f_mnist = train_float_mnist_2fc()
    i_mnist = mnist_integer_accuracy(limit=mnist_limit)
    report["mnist_2fc"] = {
        "float": f_mnist.test_acc,
        "integer": i_mnist,
        "encrypted": i_mnist,
    }

    if encrypted_samples:
        stack = stack or hi.build_stack(
            bfv.BFVParams(n=1024, data_limbs=13, seed=42), input_len=300
        )
        w = pocketnn.read_csv_matrix(
            "/root/reference/weights/SpO2/qat/quant_fc_5bits_data_2bits_weights.csv"
        ).reshape(-1)
        x, _ = load_siesta(limit_patients=2)
        hi.hhe_1fc_inference(
            stack,
            w,
            x[:encrypted_samples].astype(np.uint64),
            check_parity=True,  # raises if encrypted != integer
        )
        report["spo2_1fc"]["encrypted_parity_checked_samples"] = float(
            encrypted_samples
        )
    return report
