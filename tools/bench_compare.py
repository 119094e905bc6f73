"""Mechanical round-over-round bench diff (r6 verdict item 6).

Reads two bench artifacts — any mix of:
  - driver records (BENCH_r{N}.json: {"tail": "...", "parsed": {...}})
  - raw bench.py stdout lines / JSON files ({"queries": {...}, ...})
  - bench_detail.json sidecars ({"spread": {q: {min,med,max}}})
— extracts per-query minima, and prints the per-query delta table
sorted by absolute regression, plus totals. Exits 1 if any query
regressed more than --threshold (default 1.5x), so it can gate.

Usage: python tools/bench_compare.py OLD NEW [--threshold 1.5]
"""

from __future__ import annotations

import json
import re
import sys


def _extract(path: str) -> dict[str, float]:
    with open(path) as fh:
        raw = fh.read()
    # driver record?
    try:
        d = json.loads(raw)
    except json.JSONDecodeError:
        # raw stdout: find the last JSON object line
        lines = [ln for ln in raw.splitlines() if ln.lstrip().startswith("{")]
        if not lines:
            raise SystemExit(f"error: no JSON line found in {path}")
        d = json.loads(lines[-1])
    if isinstance(d, dict) and "tail" in d:
        parsed = d.get("parsed")
        if parsed is None:
            # salvage what survived the tail capture: whole queries
            # dict if its head survived, else per-query spread minima
            # (the r6 truncation shape)
            m = re.search(r'"queries":\s*({[^{}]*})', d["tail"])
            if m:
                parsed = {"queries": json.loads(m.group(1))}
            else:
                mins = re.findall(r'"(\w+)":\s*\{"min":\s*([\d.]+)', d["tail"])
                parsed = {"queries": {q: float(v) for q, v in mins}}
        d = parsed or {}
    if "spread" in d and "queries" not in d:
        return {q: s["min"] for q, s in d["spread"].items()}
    return {q: v for q, v in d.get("queries", {}).items() if v >= 0}


def main() -> int:
    args: list[str] = []
    thr = 1.5
    it = iter(sys.argv[1:])
    for a in it:
        if a.startswith("--threshold"):
            if "=" in a:
                thr = float(a.split("=", 1)[1])
            else:
                nxt = next(it, None)
                if nxt is None:
                    print("error: --threshold needs a value\n" + __doc__)
                    return 2
                thr = float(nxt)
        else:
            args.append(a)
    if len(args) < 2:
        print(__doc__)
        return 2
    old, new = _extract(args[0]), _extract(args[1])
    common = sorted(set(old) & set(new))
    rows = []
    for q in common:
        o, n = old[q], new[q]
        rows.append((n - o, n / o if o > 0 else float("inf"), q, o, n))
    rows.sort(reverse=True)
    print(f"{'query':<28} {'old':>8} {'new':>8} {'delta':>8} {'ratio':>6}")
    for dlt, ratio, q, o, n in rows:
        flag = " <-- regressed" if ratio > thr and dlt > 0.05 else ""
        print(f"{q:<28} {o:>8.3f} {n:>8.3f} {dlt:>+8.3f} {ratio:>6.2f}{flag}")
    only_old = sorted(set(old) - set(new))
    only_new = sorted(set(new) - set(old))
    if only_old:
        print(f"# dropped: {', '.join(only_old)}")
    if only_new:
        print(f"# added: {', '.join(f'{q}={new[q]:.3f}' for q in only_new)}")
    t_old, t_new = sum(old[q] for q in common), sum(new[q] for q in common)
    ratio = f"{t_new / t_old:.3f}" if t_old > 0 else "n/a"
    print(
        f"TOTAL(common {len(common)}) old={t_old:.2f}s new={t_new:.2f}s "
        f"ratio={ratio}"
    )
    regressed = [q for dlt, r, q, o, n in rows if r > thr and dlt > 0.05]
    return 1 if regressed else 0


if __name__ == "__main__":
    try:
        raise SystemExit(main())
    except BrokenPipeError:  # piped into head — not an error
        raise SystemExit(0)
