"""CLI entry point — the reference's daemon surface (README "Getting
Started": NewServer(config).Start) as `python -m etly_spark`.

    python -m etly_spark run --config transfers.json [--transfer NAME]
    python -m etly_spark serve --config transfers.json --port 8081

`run` ≈ POST /etly/transferOnce (one synchronous sweep, task JSON to
stdout); `serve` starts the frequency scheduler plus the management API
and blocks until interrupted.
"""

from __future__ import annotations

import argparse
import json
import sys
import time

from etly_spark.config import TransferConfig
from etly_spark.server import Server
from etly_spark.service import Service
from etly_spark.session import get_spark


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="etly_spark")
    sub = ap.add_subparsers(dest="cmd", required=True)

    run = sub.add_parser("run", help="run transfers once and exit")
    run.add_argument("--config", required=True, help="transfer config JSON")
    run.add_argument("--transfer", default="", help="only this transfer name")

    serve = sub.add_parser("serve", help="scheduler + management HTTP API")
    serve.add_argument("--config", required=True)
    serve.add_argument("--port", type=int, default=8081)
    serve.add_argument("--host", default="127.0.0.1")

    args = ap.parse_args(argv)
    cfg = TransferConfig.from_json(args.config)
    transfers = cfg.transfers
    if getattr(args, "transfer", ""):
        transfers = [t for t in transfers if t.name == args.transfer]
        if not transfers:
            print(f"unknown transfer: {args.transfer}", file=sys.stderr)
            return 2

    spark = get_spark("etly-spark")
    service = Service(spark, transfers)

    if args.cmd == "run":
        tasks = service.transfer_once()
        print(json.dumps([t.to_dict() for t in tasks], indent=1))
        return 0 if all(t.status != "ERROR" for t in tasks) else 1

    server = Server(service, port=args.port, host=args.host)
    server.start(scheduler=True)
    print(f"etly-spark serving on http://{args.host}:{server.port}/etly/status")
    try:
        while True:
            time.sleep(3600)
    except KeyboardInterrupt:
        server.stop()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
