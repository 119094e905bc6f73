"""Local approximation of the driver's correctness gate.

Runs every query in the catalog on Spark AND its DuckDB oracle over the
same parquet dir, then compares row count, sorted column names, and an
order-insensitive value hash. Usage:

    python tools/check_correctness.py [sf_dir] [query ...]

Both sides are materialized as *pandas* frames (Spark ``toPandas()``,
DuckDB ``.df()``) and cells are canonicalized through pandas dtypes,
mimicking the external driver: an uncast DuckDB ``SUM(BIGINT)`` comes
back HUGEINT → pandas float64 → ``460117.0`` while Spark yields int64
``460117`` — a value-hash mismatch this checker must reproduce, not
normalize away. Array/bytes cells are rejected the way the driver's
sort-based canonicalizer rejects them (unhashable).
"""

from __future__ import annotations

import hashlib
import sys
import time
import traceback

import duckdb

sys.path.insert(0, ".")

from etly_spark.queries import REGISTRY  # noqa: E402
from etly_spark.session import get_spark  # noqa: E402


def norm_cell(v) -> str:
    import datetime
    import math

    import numpy as np

    if isinstance(v, (np.ndarray, list, tuple, bytes, bytearray, dict)):
        # the driver's canonicalizer dies on these (unhashable in a
        # pandas sort) — surface them as hard failures here too
        raise TypeError(f"non-scalar cell of type {type(v).__name__} in result")
    if v is None or v is getattr(np, "nan", None):
        return "NULL"
    if isinstance(v, (float, np.floating)):
        f = float(v)
        if math.isnan(f):
            return "NULL"
        # pandas str() formatting: integral floats keep their '.0',
        # exposing int64-vs-float64 dtype drift exactly like the driver
        return str(f)
    if isinstance(v, np.integer):
        return str(int(v))
    if isinstance(v, (datetime.datetime, datetime.date)):
        return str(v)
    return str(v)


def table_hash(cols: list[str], rows: list[tuple]) -> str:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    lines = sorted("|".join(norm_cell(r[i]) for i in order) for r in rows)
    h = hashlib.sha256()
    for ln in lines:
        h.update(ln.encode())
        h.update(b"\n")
    return h.hexdigest()[:16]


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    only = set(sys.argv[2:])
    spark = get_spark("correctness-check")

    con = duckdb.connect()
    import os as _os

    for t in [
        "region", "nation", "customer", "supplier", "part",
        "orders", "lineitem", "events", "documents", "embeddings",
    ]:
        # testdata tables are single files; scaled-corpus tables are
        # directories of part files — glob the dir form for DuckDB
        path = f"{sf_dir}/{t}.parquet"
        if _os.path.isdir(path):
            path = f"{path}/*.parquet"
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{path}'")

    n_pass = n_fail = n_rowsonly = 0
    for name, spec in sorted(REGISTRY.items()):
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            df = spec.spark(spark, sf_dir)
            pdf_s = df.toPandas()
            sp_cols = list(pdf_s.columns)
            sp_rows = [tuple(r) for r in pdf_s.itertuples(index=False, name=None)]
        except Exception:
            print(f"FAIL {name}: SPARK ERROR")
            traceback.print_exc(limit=3)
            n_fail += 1
            continue
        if spec.oracle is None:
            # the driver still canonicalizes rows-only results — reject
            # non-scalar cells exactly like the hash path would
            try:
                for r in sp_rows:
                    for v in r:
                        norm_cell(v)
            except TypeError as e:
                print(f"FAIL {name}: rows-only canon error: {e}")
                n_fail += 1
                continue
            print(f"rows {name}: {len(sp_rows)} rows (no oracle) [{time.time()-t0:.1f}s]")
            n_rowsonly += 1
            continue
        try:
            pdf_d = con.execute(spec.oracle).df()
            du_cols = list(pdf_d.columns)
            du_rows = [tuple(r) for r in pdf_d.itertuples(index=False, name=None)]
        except Exception as e:
            print(f"FAIL {name}: ORACLE ERROR {str(e).splitlines()[0][:160]}")
            n_fail += 1
            continue
        problems = []
        if len(sp_rows) != len(du_rows):
            problems.append(f"rowcount spark={len(sp_rows)} duckdb={len(du_rows)}")
        if sorted(sp_cols) != sorted(du_cols):
            problems.append(f"cols spark={sorted(sp_cols)} duckdb={sorted(du_cols)}")
        else:
            try:
                hs, hd = table_hash(sp_cols, sp_rows), table_hash(du_cols, du_rows)
            except TypeError as e:
                print(f"FAIL {name}: canon error: {e}")
                n_fail += 1
                continue
            if hs != hd:
                problems.append(f"valuehash spark={hs} duckdb={hd}")
                order_s = sorted(range(len(sp_cols)), key=lambda i: sp_cols[i])
                order_d = sorted(range(len(du_cols)), key=lambda i: du_cols[i])
                ls = sorted("|".join(norm_cell(r[i]) for i in order_s) for r in sp_rows)
                ld = sorted("|".join(norm_cell(r[i]) for i in order_d) for r in du_rows)
                for a, b in zip(ls, ld):
                    if a != b:
                        problems.append(f"  first diff:\n   spark : {a[:300]}\n   duckdb: {b[:300]}")
                        break
        if problems:
            print(f"FAIL {name}: " + "; ".join(problems))
            n_fail += 1
        else:
            print(f"PASS {name} ({len(sp_rows)} rows) [{time.time()-t0:.1f}s]")
            n_pass += 1
    print(f"\n{n_pass} pass, {n_fail} fail, {n_rowsonly} rows-only")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
