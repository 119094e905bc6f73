"""Corpus datasheet CLI: the per-source documentation artifact a
dataset release ships (Gebru et al., "Datasheets for Datasets") —
composition, language mix, quality, duplication, PII exposure and (r12)
media stats, computed by the engine's oracle-gated primitives. The core
lives in etly_spark/operators/datasheet.py (config-addressable: a
Transfer carrying "Datasheet": {"Name": ...} ships the same report with
its output); this wrapper datasheets a testdata documents table.

Usage: python tools/datasheet.py [sf_dir] [out.json]
Writes the JSON document to out.json (default: stdout line only).
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etly_spark.io.tables import load_table  # noqa: E402
from etly_spark.operators.datasheet import build_datasheet as _build  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def build_datasheet(spark, sf_dir: str) -> dict:
    sheet = _build(load_table(spark, sf_dir, "documents"))
    sheet["sf_dir"] = os.path.abspath(sf_dir)
    return sheet


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.1"
    out = sys.argv[2] if len(sys.argv) > 2 else None
    spark = get_spark("datasheet")
    t0 = time.monotonic()
    sheet = build_datasheet(spark, sf_dir)
    sheet["build_s"] = round(time.monotonic() - t0, 2)
    if out:
        with open(out, "w") as fh:
            json.dump(sheet, fh, indent=1, default=str)
    print(
        json.dumps(
            {
                "corpus": sheet["corpus"],
                "build_s": sheet["build_s"],
                "sources": {
                    s["source"]: {
                        "docs": s["docs"],
                        "exact_dup_rate": s["exact_dup_rate"],
                        "repetitive_frac": s["repetitive_frac"],
                        "pii_total": sum(s["pii"].values()),
                    }
                    for s in sheet["sources"]
                },
            },
            default=str,
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
