"""Per-query profile: split DataFrame CONSTRUCTION time (driver-side
jobs: collects, stage builds, eager persists) from EXECUTION time (the
noop-sink action), min-of-N each, for one or more catalog queries.

Usage: python tools/profile_query.py <query> [query...] [--runs N]

Construction and execution are timed per run with a cleared CacheManager
(the bench protocol), so numbers are comparable to bench.py minima:
bench's per-query second ~= build + exec here.
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etly_spark.queries import REGISTRY  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def main() -> int:
    args = [a for a in sys.argv[1:] if not a.startswith("--")]
    runs = 3
    for a in sys.argv[1:]:
        if a.startswith("--runs"):
            runs = int(a.split("=", 1)[1]) if "=" in a else int(sys.argv[sys.argv.index(a) + 1])
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("etly-spark-profile")
    # same warmup as bench: python workers + page cache
    spark.range(0, 128, 1, 32).mapInPandas(lambda it: it, "id long").write.format(
        "noop"
    ).mode("overwrite").save()
    for name in args:
        spec = REGISTRY.get(name)
        if spec is None:
            print(f"unknown query: {name}")
            continue
        samples = []
        for _ in range(runs):
            spark.catalog.clearCache()
            t0 = time.monotonic()
            df = spec.spark(spark, sf_dir)
            t1 = time.monotonic()
            df.write.format("noop").mode("overwrite").save()
            t2 = time.monotonic()
            samples.append((t1 - t0, t2 - t1, t2 - t0))
        b = min(s[0] for s in samples)
        e = min(s[1] for s in samples)
        t = min(s[2] for s in samples)
        print(
            f"PROFILE {name}: build={b:.2f}s exec={e:.2f}s total(min)={t:.2f}s "
            f"runs={[f'{s[2]:.2f}' for s in samples]}"
        )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
