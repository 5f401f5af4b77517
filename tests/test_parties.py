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
    finally:
        aserver.stop()
        cserver.stop()
