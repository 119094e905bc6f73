"""Skew-aware join strategies.

``split_broadcast_join`` is the hot/rare split: when a probe table joins
a dimension whose key frequency is Zipfian (token -> corpus frequency,
span hash -> doc count, item -> popularity), the handful of hot keys
receive most probe rows and a plain shuffle join funnels them into a few
straggler partitions. Salting (queries/relational.py:q26) fixes the
*aggregation* form of this; for joins the cheaper fix is structural:

- the dimension's top-K rows by weight are tiny -> broadcast-join them
  (hot probe rows never shuffle at all);
- the remaining keys are rare by construction -> a plain shuffle join on
  them is balanced.

The result is identical to the single join for ANY split, so the K knob
is purely a performance choice (bound it by what comfortably broadcasts:
top-1024 rows is ~KBs). The reference has no analogous operator (its
transfers never join); this serves the relational/LLM query surface.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def split_broadcast_join(
    probe: DataFrame,
    dim: DataFrame,
    key: str,
    weight: str,
    hot_k: int = 1024,
) -> DataFrame:
    """Inner-join ``probe`` with ``dim`` on ``key``, routing the probe
    rows of the ``hot_k`` heaviest dimension keys (by the ``weight``
    column, ties broken by key for determinism) through a broadcast
    join and the rest through a shuffle join.

    The hot set is selected with a top-K (TakeOrderedAndProject — O(K)
    driver/broadcast memory at any dimension size), so the plan is
    corpus-size independent. PRECONDITION: ``dim`` must be UNIQUE on
    ``key`` (a frequency/dimension table — every current caller
    aggregates it first). With duplicate keys, rows of one key
    straddling the top-K boundary would be half-broadcast and the
    anti-join would drop the probe's matches against the other half.
    For unique-key dims, output = probe INNER JOIN dim, exactly, for
    any ``hot_k``.
    """
    hot = F.broadcast(dim.orderBy(F.desc(weight), F.asc(key)).limit(hot_k))
    hot_part = probe.join(hot, key)
    # the SAME broadcast subtree drives the anti-join (ReusedExchange:
    # the top-k is computed and shipped once, not per consumer)
    rare_probe = probe.join(hot, key, "left_anti")
    rare_part = rare_probe.join(dim, key)
    return hot_part.unionByName(rare_part)
