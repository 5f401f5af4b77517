"""Three-party protocol integration test: Analyst, User, CSP as real gRPC
services on localhost (the reference only documents this as a manual flow,
README.md:96-117 — here it is an automated test)."""

import time

import numpy as np
import pytest

from hhe_tpu.ops import bfv
from hhe_tpu.parties import rpc
from hhe_tpu.parties.gen import hhe_pb2 as pb
from hhe_tpu.parties.analyst import Analyst, AnalystServer
from hhe_tpu.parties.csp import CSP, CSPServer
from hhe_tpu.parties.user import User, patient_id_from_path

PARAMS = bfv.BFVParams(n=1024, data_limbs=13, seed=42)
ANALYST_ADDR = "localhost:50951"
CSP_ADDR = "localhost:50952"


def test_patient_id_parsing():
    assert patient_id_from_path("/x/y/c000101_data.txt") == "c000101"


def test_three_party_protocol(tmp_path):
    rng = np.random.default_rng(7)
    L = 128
    w = rng.integers(-3, 4, (L, 1))
    x = rng.integers(0, 32, (2, L))

    analyst = Analyst(PARAMS, input_len=L)
    analyst.encrypt_model(w)
    aserver = AnalystServer(analyst, ANALYST_ADDR)
    csp = CSP(PARAMS, workdir=str(tmp_path))
    cserver = CSPServer(csp, CSP_ADDR)
    try:
        aserver.publish_to_csp(CSP_ADDR)

        user = User(PARAMS, data=x)
        user.submit(ANALYST_ADDR, CSP_ADDR, "c000101")

        # decomposition checkpoint written by the CSP
        fname = f"c000101_{analyst.uuid}.bin"
        assert (tmp_path / fname).exists()

        # externally trigger evaluation from the checkpoint file
        analyst.input_len = L  # analyst reads slot L-1
        client = rpc.csp_client(CSP_ADDR)
        client.call("evaluateModelFromFile", pb.DataFile(filename=fname))
        client.close()

        assert aserver.results_ready.wait(timeout=300)
        expect_raw = x.astype(np.int64) @ w.reshape(-1)
        assert np.array_equal(np.asarray(analyst.raw_results), expect_raw)
        assert np.array_equal(
            np.asarray(analyst.predictions), (expect_raw > 0).astype(int)
        )

        # evaluateModel via CiphertextBytes push (reference CSPRPC.cpp:227-275
        # / deserializeCiphertexts CSP.cpp:552-605): the caller streams the
        # size-prefix-framed decomposition ciphertexts itself, split across
        # MULTIPLE repeated HHEDecomp entries, routed by analyst UUID.
        from hhe_tpu.utils import serial

        cts = serial.load_ciphertext_vec((tmp_path / fname).read_bytes())
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
    finally:
        aserver.stop()
        cserver.stop()


def test_two_analysts_long_input_over_wire(tmp_path):
    """The reference's whole multi-tenant story (CSPRPC.cpp:316-327) plus the
    300-length mask+flatten decompose path (CSP.cpp:260-283) exercised over
    real gRPC: one CSP serves TWO analysts with different models AND
    different input lengths (300 = 3-block mask+flatten; 128 = single
    block); a user submits records to each; each analyst gets its own
    correct result."""
    rng = np.random.default_rng(11)
    lens = (300, 128)  # per-analyst submission lengths

    csp = CSP(PARAMS, workdir=str(tmp_path))
    cserver = CSPServer(csp, "localhost:50962")
    analysts, aservers, ws, xs = [], [], [], []
    try:
        for i, addr in enumerate(("localhost:50963", "localhost:50964")):
            L = lens[i]
            xs.append(rng.integers(0, 16, (1, L)))
            w = rng.integers(-3, 4, (L, 1))
            ws.append(w)
            a = Analyst(
                bfv.BFVParams(n=1024, data_limbs=13, seed=100 + i), input_len=L
            )
            a.encrypt_model(w)
            srv = AnalystServer(a, addr)
            srv.publish_to_csp("localhost:50962")
            analysts.append(a)
            aservers.append(srv)

        # protocol key hygiene: all parties' secret keys differ
        from hhe_tpu.utils import checks

        checks.are_same_he_sk(analysts[0].sk, analysts[1].sk)
        checks.are_same_he_sk(analysts[0].sk, csp.sk)
        checks.are_same_he_sk(analysts[1].sk, csp.sk)

        for i, addr in enumerate(("localhost:50963", "localhost:50964")):
            user = User(PARAMS, data=xs[i])
            user.submit(addr, "localhost:50962", f"p{i}")
            # CSP recorded the true submission length (no hard-coded 300)
            assert csp.state(addr).input_len == lens[i]

            client = rpc.csp_client("localhost:50962")
            client.call(
                "evaluateModelFromFile",
                pb.DataFile(filename=f"p{i}_{analysts[i].uuid}.bin"),
            )
            client.close()
            assert aservers[i].results_ready.wait(timeout=300)

        for i in range(2):
            expect = xs[i].astype(np.int64) @ ws[i].reshape(-1)
            assert np.array_equal(np.asarray(analysts[i].raw_results), expect), i
    finally:
        for srv in aservers:
            srv.stop()
        cserver.stop()


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
