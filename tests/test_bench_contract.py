"""The driver records only the LAST 2000 chars of bench.py's stdout and
parses the JSON line found inside (BENCH_r05 parsed at ~1920 chars;
BENCH_r06's spread-inflated ~6 KB line came back "parsed": null).

This gates the output-line construction against the real registry: worst
plausible values, all 50 query names, staging/pipeline/load fields — the
line must stay under bench.LINE_BUDGET and round-trip through json.loads
with the contract-required keys."""

import json

import bench
from etly_spark.queries import REGISTRY


def _worst_case_line() -> str:
    # 4-digit seconds with 3 decimals is the widest realistic rendering.
    times = {name: 999.999 for name in REGISTRY}
    groups = {
        g: 9999.99 for g in ("dedup", "relational", "text", "etly", "mm", "sim")
    }
    return bench.format_line(
        total=99999.9999,
        times=times,
        groups=groups,
        sf=100.0,
        n_failed=50,
        runs=10,
        med_total=99999.999,
        max_total=99999.999,
        load=(99.9, 99.9),
        pipeline={"records_per_sec": 99999999.9, "ok": False},
        staging_stats={"hits": 9999, "misses": 9999, "build_sec": 9999.9999},
    )


def test_line_under_driver_tail_budget():
    line = _worst_case_line()
    assert "\n" not in line
    assert len(line) <= bench.LINE_BUDGET, len(line)


def test_line_carries_contract_fields():
    d = json.loads(_worst_case_line())
    assert d["metric"] == "catalog_total_runtime"
    assert d["unit"] == "sec"
    assert set(d["queries"]) == set(REGISTRY)
    for key in ("value", "sf", "n_queries", "groups"):
        assert key in d
