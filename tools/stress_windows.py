"""P3 A/B: serial vs concurrent window submission, one JSON line.

Reproduces the STRESS.md measurement: N hourly look-back windows of
ndjson files run through the full transfer path (list → decode →
transform → routed 1:1 sink → per-window ledger) with
MAX_WINDOW_THREADS=1 vs 8, interleaved best-of-2.

Usage: python tools/stress_windows.py [n_windows] [files_per_window]
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time
from datetime import datetime, timezone

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etly_spark import pipeline as P  # noqa: E402
from etly_spark.config import Duration, Resource, Source, Target, Transfer  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def build(work: str, n_windows: int, n_files: int) -> Transfer:
    for h in range(1, n_windows + 1):
        d = os.path.join(work, "in", f"201706{12:02d}{h:02d}")
        os.makedirs(d)
        for i in range(n_files):
            with open(os.path.join(d, f"f{i:03d}.log"), "w") as f:
                f.write(f'{{"Id":{h * 1000 + i},"Name":"n{i}","Type":"a"}}\n')
    os.makedirs(os.path.join(work, "out"))
    return Transfer(
        name="p3ab",
        base_dir=work,
        source=Source(
            name=os.path.join(work, "in", "<dateFormat:yyyyMMddHH>"),
            data_type="test.Log1",
        ),
        target=Target(name=os.path.join(work, "out", "<dateFormat:yyyyMMddHH>", "<file>")),
        meta=Resource(name=os.path.join(work, "out", "meta-<dateFormat:yyyyMMddHH>.json")),
        transformer="test.Log1ToLog2",
        time_window=Duration(duration=n_windows, unit="hour"),
    )


def main() -> int:
    n_windows = int(sys.argv[1]) if len(sys.argv) > 1 else 12
    n_files = int(sys.argv[2]) if len(sys.argv) > 2 else 50
    spark = get_spark("etly-p3-ab")
    import tests.test_pipeline_e2e  # noqa: F401 — registers test.Log1

    now = datetime(2017, 6, 12, n_windows, 30, 0, tzinfo=timezone.utc)
    results: dict[int, list[float]] = {}
    for threads in (1, 8, 1, 8):  # interleaved: cancels warmup bias
        P.MAX_WINDOW_THREADS = threads
        work = tempfile.mkdtemp(prefix=f"p3ab_{threads}_")
        t = build(work, n_windows, n_files)
        t0 = time.monotonic()
        r = P.TransferService(spark).run(t, now)
        sec = time.monotonic() - t0
        assert r.status == "DONE" and r.progress.file_processed == n_windows * n_files, (
            r.status,
            vars(r.progress),
            r.error,
        )
        results.setdefault(threads, []).append(round(sec, 2))
    print(
        json.dumps(
            {
                "metric": "p3_window_ab",
                "windows": n_windows,
                "files_per_window": n_files,
                "serial_sec": min(results[1]),
                "parallel_sec": min(results[8]),
                "speedup": round(min(results[1]) / min(results[8]), 2),
                "runs": results,
            }
        )
    )
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
