"""Three-party protocol integration tests: Analyst, User, CSP as real gRPC
services on localhost (the reference only documents this as a manual flow,
README.md:96-117 — here it is an automated test).

One CSP + two analysts (input lengths 300 and 128) are started ONCE at
module scope and shared by the wire tests — the party stacks (keygen +
transcipher key stacks) dominate wall time, so building them once keeps the
fast suite fast."""

import numpy as np
import pytest

from hhe_tpu.ops import bfv
from hhe_tpu.parties import rpc
from hhe_tpu.parties.gen import hhe_pb2 as pb
from hhe_tpu.parties.analyst import Analyst, AnalystServer
from hhe_tpu.parties.csp import CSP, CSPServer
from hhe_tpu.parties.user import User, patient_id_from_path
from hhe_tpu.utils import metrics

PARAMS = bfv.BFVParams(n=1024, data_limbs=13, seed=42)
CSP_ADDR = "localhost:50952"
ANALYST_ADDRS = ("localhost:50963", "localhost:50951")
LENS = (300, 128)  # analyst 0: 3-block mask+flatten; analyst 1: single block


class _WireEnv:
    def __init__(self, tmp_path):
        rng = np.random.default_rng(7)
        self.tmp_path = tmp_path
        self.csp = CSP(PARAMS, workdir=str(tmp_path))
        self.cserver = CSPServer(self.csp, CSP_ADDR)
        self.analysts, self.aservers, self.ws = [], [], []
        for i, (L, addr) in enumerate(zip(LENS, ANALYST_ADDRS)):
            w = rng.integers(-3, 4, (L, 1))
            a = Analyst(
                bfv.BFVParams(n=1024, data_limbs=13, seed=100 + i), input_len=L
            )
            a.encrypt_model(w)
            srv = AnalystServer(a, addr)
            srv.publish_to_csp(CSP_ADDR)
            self.ws.append(w)
            self.analysts.append(a)
            self.aservers.append(srv)

    def stop(self):
        for srv in self.aservers:
            srv.stop()
        self.cserver.stop()


@pytest.fixture(scope="module")
def env(tmp_path_factory):
    e = _WireEnv(tmp_path_factory.mktemp("wire"))
    try:
        yield e
    finally:
        e.stop()


def test_patient_id_parsing():
    assert patient_id_from_path("/x/y/c000101_data.txt") == "c000101"


def test_three_party_protocol(env):
    """Full single-analyst flow against analyst 1 (L=128): submit, checkpoint
    file, evaluateModelFromFile resume, evaluateModel CiphertextBytes push,
    and the reference's end-of-run experiment report."""
    rng = np.random.default_rng(8)
    analyst, aserver, w = env.analysts[1], env.aservers[1], env.ws[1]
    L = LENS[1]
    x = rng.integers(0, 32, (2, L))

    user = User(PARAMS, data=x)
    user.submit(ANALYST_ADDRS[1], CSP_ADDR, "c000101")

    # decomposition checkpoint written by the CSP
    fname = f"c000101_{analyst.uuid}.bin"
    assert (env.tmp_path / fname).exists()

    # externally trigger evaluation from the checkpoint file
    client = rpc.csp_client(CSP_ADDR)
    client.call("evaluateModelFromFile", pb.DataFile(filename=fname))
    client.close()

    assert aserver.results_ready.wait(timeout=300)
    expect_raw = x.astype(np.int64) @ w.reshape(-1)
    assert np.array_equal(np.asarray(analyst.raw_results), expect_raw)
    assert np.array_equal(
        np.asarray(analyst.predictions), (expect_raw > 0).astype(int)
    )

    # end-of-run experiment report (reference hhe_pktnn_examples.cpp:352-380):
    # per-party ms and per-edge MB, aggregated from each party's own meters
    timer, ledger = metrics.merge(
        timers=(analyst.timer, user.timer, env.csp.timer),
        ledgers=(analyst.ledger, user.ledger, env.csp.ledger),
    )
    acc = float(np.mean((expect_raw > 0).astype(int) == np.asarray(analyst.predictions)))
    report = metrics.experiment_report(timer, ledger, accuracy=acc)
    print(metrics.format_experiment_report(report), flush=True)
    for party in ("analyst", "user", "csp", "total"):
        assert report["computation_ms"][party] > 0.0, party
    for edge in ("analyst-user", "user-csp", "analyst-csp", "total"):
        assert report["communication_mb"][edge] > 0.0, edge
    assert report["accuracy"] == 1.0

    # evaluateModel via CiphertextBytes push (reference CSPRPC.cpp:227-275
    # / deserializeCiphertexts CSP.cpp:552-605): the caller streams the
    # size-prefix-framed decomposition ciphertexts itself, split across
    # MULTIPLE repeated HHEDecomp entries, routed by analyst UUID.
    from hhe_tpu.utils import serial

    cts = serial.load_ciphertext_vec((env.tmp_path / fname).read_bytes())
    assert len(cts) == 2  # one per submitted record
    analyst.raw_results.clear()
    analyst.predictions.clear()
    aserver.results_ready.clear()
    msg = pb.CiphertextBytes(analystID=analyst.uuid)
    for ct in cts:  # one frame per repeated entry — multi-record payload
        msg.HHEDecomp.append(serial.dump_ciphertext_vec([ct]))
    client = rpc.csp_client(CSP_ADDR)
    client.call("evaluateModel", msg)
    client.close()
    assert aserver.results_ready.wait(timeout=300)
    assert np.array_equal(np.asarray(analyst.raw_results), expect_raw)


def test_two_analysts_long_input_over_wire(env):
    """The reference's whole multi-tenant story (CSPRPC.cpp:316-327) plus the
    300-length mask+flatten decompose path (CSP.cpp:260-283) exercised over
    real gRPC: one CSP serves TWO analysts with different models AND
    different input lengths (300 = 3-block mask+flatten; 128 = single
    block); a user submits records to each; each analyst gets its own
    correct result."""
    rng = np.random.default_rng(11)

    # protocol key hygiene: all parties' secret keys differ
    from hhe_tpu.utils import checks

    checks.are_same_he_sk(env.analysts[0].sk, env.analysts[1].sk)
    checks.are_same_he_sk(env.analysts[0].sk, env.csp.sk)
    checks.are_same_he_sk(env.analysts[1].sk, env.csp.sk)

    xs = []
    for i, addr in enumerate(ANALYST_ADDRS):
        L = LENS[i]
        xs.append(rng.integers(0, 16, (1, L)))
        env.analysts[i].raw_results.clear()
        env.analysts[i].predictions.clear()
        env.aservers[i].results_ready.clear()

        user = User(PARAMS, data=xs[i])
        user.submit(addr, CSP_ADDR, f"p{i}")
        # CSP recorded the true submission length (no hard-coded 300)
        assert env.csp.state(addr).input_len == LENS[i]

        client = rpc.csp_client(CSP_ADDR)
        client.call(
            "evaluateModelFromFile",
            pb.DataFile(filename=f"p{i}_{env.analysts[i].uuid}.bin"),
        )
        client.close()
        assert env.aservers[i].results_ready.wait(timeout=300)

    for i in range(2):
        expect = xs[i].astype(np.int64) @ env.ws[i].reshape(-1)
        assert np.array_equal(np.asarray(env.analysts[i].raw_results), expect), i


def test_typed_grpc_status_on_bad_payload(tmp_path):
    """Bad payloads map to typed statuses, not UNKNOWN (reference
    CSPRPC.cpp:241-244 returns Status(DATA_LOSS, ...))."""
    import grpc

    csp = CSP(PARAMS, workdir=str(tmp_path))
    cserver = CSPServer(csp, "localhost:50965")
    try:
        client = rpc.csp_client("localhost:50965")
        msg = pb.EncSymmetricKeysMsg()
        msg.key.append(pb.CiphertextMsg(data=b"garbage-not-a-ciphertext", length=24))
        with pytest.raises(grpc.RpcError) as ei:
            client.call("addEncryptedKeys", msg, metadata=(("analystid", "a"),))
        assert ei.value.code() == grpc.StatusCode.DATA_LOSS
        # missing checkpoint file -> NOT_FOUND
        with pytest.raises(grpc.RpcError) as ei:
            client.call(
                "evaluateModelFromFile", pb.DataFile(filename="nope_deadbeef.bin")
            )
        assert ei.value.code() in (
            grpc.StatusCode.NOT_FOUND,
            grpc.StatusCode.DATA_LOSS,
        )
        client.close()
    finally:
        cserver.stop()
