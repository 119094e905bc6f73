"""Log-structured compaction for append-per-run hive-partitioned dirs.

Shared by the meta ledger sidecar (one ``run_ts=…`` partition per
window, pipeline.py) and the streaming signature index (one
``epoch=…`` partition per micro-batch, streaming/dedup.py): both
append one small partition per unit of work — the write pattern that
is O(new) per run but accumulates directories forever. When loose
partitions exceed ``threshold`` they fold into a numbered
``<key>=_compacted-NNNNNN`` segment that is NEVER rewritten (tiered),
so amortized compaction cost per run stays O(that run's rows) and
directory count stays bounded at any run count.

Crash safety: the segment is written under an underscore-prefixed tmp
dir (invisible to pyarrow/Spark dataset discovery) and committed with
one rename BEFORE the loose dirs are removed — a crash at worst leaves
duplicate rows, which every consumer here tolerates (presence-based
skip-set; distinct-pair candidate generation).
"""

from __future__ import annotations

import os
import shutil
import uuid


def compact_partitions(root: str, key: str, threshold: int) -> None:
    """Fold loose ``<key>=value`` partitions under ``root`` into one
    compacted segment once their count exceeds ``threshold``."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    if not os.path.isdir(root):
        return
    prefix = f"{key}="
    names = [d for d in os.listdir(root) if d.startswith(prefix)]
    loose = sorted(d for d in names if not d.startswith(f"{prefix}_compacted-"))
    if len(loose) <= threshold:
        return
    n_segs = sum(1 for d in names if d.startswith(f"{prefix}_compacted-"))
    tables = []
    for d in loose:
        pdir = os.path.join(root, d)
        for f in sorted(os.listdir(pdir)):
            if f.endswith(".parquet"):
                tables.append(pq.read_table(os.path.join(pdir, f)))
    if not tables:
        return
    seg = os.path.join(root, f"{prefix}_compacted-{n_segs + 1:06d}")
    tmp = os.path.join(root, f"_tmp-{uuid.uuid4().hex[:8]}")
    os.makedirs(tmp, exist_ok=True)
    pq.write_table(pa.concat_tables(tables), os.path.join(tmp, "part-00000.parquet"))
    os.rename(tmp, seg)
    for d in loose:
        shutil.rmtree(os.path.join(root, d), ignore_errors=True)
