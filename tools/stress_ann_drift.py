"""Quantizer DRIFT probe (r12 — verdict item 4): the ivf_inc gate
proves the frozen-quantizer fold is lossless vs a batch build UNDER THE
SAME quantizer — it says nothing about recall when the corpus
DISTRIBUTION drifts across epochs (clusters the shard-0 quantizer never
saw). This probe measures exactly that and prices the two remedies.

Fixture: E epochs x P vectors; planted 16-vector clusters (the
clustered_embedding arithmetic) whose anchors SHIFT by +DRIFT per epoch
along the first 16 of 64 dims — epoch E-1 mass lives in a region no
epoch-0 vector occupies. Queries come from the LAST (most drifted)
epoch; recall@5 is against the full corpus' brute top-5.

Measured:
- recall of the FROZEN epoch-0 quantizer (the ivf_inc default);
- recall after split_hot_cells (the log-structured remedy — drifted
  mass piles into the frontier cells, which split);
- recall of a REFROZEN quantizer (full-corpus re-selection + rebuild —
  the expensive O(N) remedy the maintenance loop exists to avoid);
- the max-cell-share curve after each epoch fold (max cell count /
  total) — the documented refreeze/split TRIGGER: uniform load is
  1/nlist, so share > SPLIT_TRIGGER_X / nlist means the frontier cell
  holds SPLIT_TRIGGER_X cells' worth of postings and probe cost on it
  has degraded by that factor (rule recorded in OPERATORS.md).

Usage: python tools/stress_ann_drift.py [epochs] [per_epoch] [drift]
Writes one JSON line to stdout.
"""

from __future__ import annotations

import json
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402

from etly_spark.session import get_spark  # noqa: E402

SPLIT_TRIGGER_X = 4.0  # split/refreeze when max cell share > X / nlist


def drifted_embedding(per_epoch: int, drift: float) -> F.Column:
    """clustered_embedding + a per-epoch shift of the anchor along the
    first 16 dims: epoch = vec_id // per_epoch (ids arrive in epoch
    order), so later epochs occupy regions earlier quantizers never
    saw."""
    anchor = F.col("vec_id") - (F.col("vec_id") % 16)
    epoch = F.floor(F.col("vec_id") / F.lit(per_epoch))

    def comp(j):
        a = (
            (((anchor % 2147483648) * 2654435761 + j * 40503) % 4294967296) % 2001
            - 1000
        ) / 1000.0
        p = (
            (((F.col("vec_id") % 2147483648) * 48271 + j * 9301) % 4294967296) % 4096
            - 2048
        ) / 8000.0
        base = a + p
        return F.when(j <= 16, base + epoch * F.lit(drift)).otherwise(base)

    return F.transform(F.sequence(F.lit(1), F.lit(64)), comp)


def main() -> int:
    epochs = int(sys.argv[1]) if len(sys.argv) > 1 else 8
    per = int(sys.argv[2]) if len(sys.argv) > 2 else 16000
    drift = float(sys.argv[3]) if len(sys.argv) > 3 else 0.35
    spark = get_spark("stress-ann-drift")

    from etly_spark.functions import vector as V
    from etly_spark.queries.similarity import (
        _normed,
        _probe_ivf_index,
        _query_pdf,
        centroid_plan,
        fold_ivf_epoch,
        select_centroids,
        sim_topk_bruteforce,
        split_hot_cells,
    )
    from tools.stress_ann import recall_at5

    n = epochs * per
    corpus = _normed(
        spark.range(n).select(
            F.col("id").alias("vec_id"),
            drifted_embedding(per, drift).alias("embedding"),
        )
    ).persist()
    corpus.count()

    # queries: 8 clusters of the LAST (most drifted) epoch
    q0 = (epochs - 1) * per
    qwhere = f"vec_id >= {q0} AND vec_id < {q0 + 128} AND vec_id % 16 = 0"
    q_pdf = _query_pdf(corpus, qwhere)
    brute = sim_topk_bruteforce(spark, "/root/testdata/sf0.1", corpus, q_pdf).persist()
    brute.count()

    root = tempfile.mkdtemp(prefix="anndrift_")
    shard0 = corpus.where(F.col("vec_id") < per)
    centroid_plan(shard0).write.parquet(os.path.join(root, "quantizer"))
    cent_pdf = select_centroids(shard0)
    nlist = len(cent_pdf)

    max_share_curve = []
    total = 0
    cell_counts: dict[int, int] = {}
    for e in range(epochs):
        fold_ivf_epoch(
            corpus.where(
                (F.col("vec_id") >= e * per) & (F.col("vec_id") < (e + 1) * per)
            ),
            cent_pdf,
            os.path.join(root, "postings"),
            e,
        )
        for r in (
            spark.read.parquet(os.path.join(root, "postings", f"epoch={e}"))
            .groupBy("cent_id")
            .agg(F.count(F.lit(1)).alias("c"))
            .collect()
        ):
            cell_counts[int(r["cent_id"])] = cell_counts.get(int(r["cent_id"]), 0) + int(r["c"])
        total += per
        max_share_curve.append(round(max(cell_counts.values()) / total, 4))

    t0 = time.monotonic()
    out = {
        "epochs": epochs,
        "per_epoch": per,
        "drift": drift,
        "nlist": nlist,
        "uniform_share": round(1.0 / nlist, 4),
        "max_share_curve": max_share_curve,
        "trigger_share": round(SPLIT_TRIGGER_X / nlist, 4),
        "trigger_fired_at_epoch": next(
            (i for i, s in enumerate(max_share_curve) if s > SPLIT_TRIGGER_X / nlist),
            None,
        ),
    }
    out["recall_frozen"] = recall_at5(brute, _probe_ivf_index(spark, root, qwhere=qwhere))
    out["frozen_probe_s"] = round(time.monotonic() - t0, 2)

    t0 = time.monotonic()
    st = split_hot_cells(spark, root)
    out["split_s"] = round(time.monotonic() - t0, 2)
    out["split_cells"] = len(st["split"])
    out["split_sub_cells"] = st["sub_cells"]
    t0 = time.monotonic()
    out["recall_split"] = recall_at5(brute, _probe_ivf_index(spark, root, qwhere=qwhere))
    out["split_probe_s"] = round(time.monotonic() - t0, 2)

    # refreeze: full-corpus quantizer re-selection + one-shot rebuild —
    # the O(N) alternative the split avoids
    root2 = tempfile.mkdtemp(prefix="anndrift_refreeze_")
    t0 = time.monotonic()
    centroid_plan(corpus).write.parquet(os.path.join(root2, "quantizer"))
    fold_ivf_epoch(corpus, select_centroids(corpus), os.path.join(root2, "postings"), 0)
    out["refreeze_rebuild_s"] = round(time.monotonic() - t0, 2)
    out["recall_refrozen"] = recall_at5(
        brute, _probe_ivf_index(spark, root2, qwhere=qwhere)
    )

    print(json.dumps(out))
    return 0


if __name__ == "__main__":
    sys.exit(main())
