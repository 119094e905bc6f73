"""Per-round benchmark: run every catalog query at $SPARK_GRAFT_SF_DIR.

Prints ONE JSON line:
    {"metric": "...", "value": N, "unit": "sec", "queries": {...}, "sf": ...}

Each query is forced to full execution with the `noop` sink (all work, no
result materialization on the driver) — the same shape a cluster write has.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from etly_spark.queries import REGISTRY  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def sf_from_dir(sf_dir: str) -> float:
    m = re.search(r"sf([0-9.]+)", sf_dir)
    return float(m.group(1).rstrip(".")) if m else -1.0


def run_query(spark, builder, sf_dir: str) -> float:
    t0 = time.monotonic()
    df = builder(spark, sf_dir)
    df.write.format("noop").mode("overwrite").save()
    return time.monotonic() - t0


def main() -> int:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("etly-spark-bench")

    # Warm the JVM/codegen path once on the cheapest query so the first
    # measured query doesn't pay session startup.
    specs = sorted(REGISTRY.items())
    try:
        run_query(spark, specs[0][1].spark, sf_dir)
    except Exception:
        pass

    times: dict[str, float] = {}
    for name, spec in specs:
        try:
            times[name] = round(run_query(spark, spec.spark, sf_dir), 4)
        except Exception as exc:  # record failures as -1, keep benching
            print(f"# bench FAIL {name}: {exc}", file=sys.stderr)
            times[name] = -1.0

    ok = [v for v in times.values() if v >= 0]
    total = round(sum(ok), 4)
    print(
        json.dumps(
            {
                "metric": "catalog_total_runtime",
                "value": total,
                "unit": "sec",
                "queries": times,
                "sf": sf_from_dir(sf_dir),
                "n_queries": len(times),
                "n_failed": len(times) - len(ok),
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
