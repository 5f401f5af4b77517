"""CLI entry points for the three parties.

Equivalent to the reference binaries ``analyst``, ``user``, ``csp``
(reference ``AnalystRPC.cpp:91-152``, ``UserRPC.cpp:6-96``,
``CSPRPC.cpp:358-392``), with the same default addresses
(analyst localhost:50051, csp localhost:50052) and startup order
csp -> analyst -> user (reference README.md:96-117).

Usage:
    python -m hhe_tpu.parties.cli csp [url]
    python -m hhe_tpu.parties.cli analyst [url] [csp_url] [--weights CSV] [--input-len N]
    python -m hhe_tpu.parties.cli user [analyst_url] [csp_url] [--data CSV]
"""

from __future__ import annotations

import argparse
import sys
import time

import numpy as np

from ..ops.bfv import BFVParams

DEFAULT_ANALYST = "localhost:50051"
DEFAULT_CSP = "localhost:50052"
DEFAULT_DATA = (
    "/root/reference/data/Harpocrates_recordingwise_SIESTA_4percent/c000101_data.txt"
)
DEFAULT_WEIGHTS = (
    "/root/reference/weights/SpO2/qat/quant_fc_5bits_data_2bits_weights.csv"
)


def _params(args) -> BFVParams:
    return BFVParams(n=args.n, data_limbs=args.limbs)


def _add_common(p):
    p.add_argument("--n", type=int, default=16384, help="BFV polynomial degree")
    p.add_argument("--limbs", type=int, default=13, help="RNS data limbs")
    p.add_argument(
        "--verbose", action="store_true", help="verbose logging (config::verbose)"
    )


def main(argv=None):
    ap = argparse.ArgumentParser(prog="hhe_tpu.parties")
    sub = ap.add_subparsers(dest="party", required=True)

    pa = sub.add_parser("analyst")
    pa.add_argument("url", nargs="?", default=DEFAULT_ANALYST)
    pa.add_argument("csp_url", nargs="?", default=DEFAULT_CSP)
    pa.add_argument("--weights", default=DEFAULT_WEIGHTS)
    pa.add_argument("--input-len", type=int, default=300)
    _add_common(pa)

    pu = sub.add_parser("user")
    pu.add_argument("analyst_url", nargs="?", default=DEFAULT_ANALYST)
    pu.add_argument("csp_url", nargs="?", default=DEFAULT_CSP)
    pu.add_argument("--data", default=DEFAULT_DATA)
    pu.add_argument("--rows", type=int, default=2, help="rows to encrypt")
    _add_common(pu)

    pc = sub.add_parser("csp")
    pc.add_argument("url", nargs="?", default=DEFAULT_CSP)
    pc.add_argument("--workdir", default=".")
    _add_common(pc)

    args = ap.parse_args(argv)

    if args.party == "csp":
        from ..utils.config import RunConfig
        from .csp import CSP, CSPServer

        csp = CSP(
            _params(args),
            workdir=args.workdir,
            run_config=RunConfig(verbose=args.verbose),
        )
        server = CSPServer(csp, args.url)
        print(f"[CSP] serving on {args.url}")
        try:
            while True:
                time.sleep(3600)
        except KeyboardInterrupt:
            server.stop()
        return

    if args.party == "analyst":
        from .analyst import Analyst, AnalystServer

        analyst = Analyst(_params(args), input_len=args.input_len)
        print(f"[Analyst] uuid={analyst.uuid}")
        analyst.load_and_encrypt_model(args.weights)
        server = AnalystServer(analyst, args.url)
        print(f"[Analyst] serving on {args.url}; publishing keys+model to {args.csp_url}")
        server.publish_to_csp(args.csp_url)
        print("[Analyst] ready; waiting for results (Ctrl-C to stop)")
        try:
            while True:
                time.sleep(5)
                if analyst.predictions:
                    print(f"[Analyst] predictions so far: {analyst.predictions}")
        except KeyboardInterrupt:
            server.stop()
        return

    if args.party == "user":
        from .user import User, patient_id_from_path

        user = User.from_csv(args.data, params=_params(args))
        pid = patient_id_from_path(args.data)
        print(f"[User] patient {pid}: submitting {args.rows} encrypted rows")
        user.submit(args.analyst_url, args.csp_url, pid, rows=slice(0, args.rows))
        print("[User] done")


if __name__ == "__main__":
    main()
