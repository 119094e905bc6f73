"""PII scrubber: expression-level goldens for every rule class, then
the builtin `etly.RedactPII` driving a config-only Transfer end-to-end
(the compliance stage of a curation pipeline, name-in-config)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

CASES = [
    # (raw, redacted, class counted)
    ("reach me at jane.doe+spam@mail.example.co.uk today", "reach me at <EMAIL> today", "n_email"),
    ("ssn is 123-45-6789 ok", "ssn is <SSN> ok", "n_ssn"),
    ("call +1 (555) 123-4567 now", "call <PHONE> now", "n_phone"),
    ("call (555) 123-4567 now", "call <PHONE> now", "n_phone"),
    ("call 555-123-4567 now", "call <PHONE> now", "n_phone"),
    ("server at 192.168.001.200 fell over", "server at <IP> fell over", "n_ip"),
    ("card 1234-5678-9012-3456 declined", "card <CARD> declined", "n_card"),
    ("card 1234 5678 9012 3456 declined", "card <CARD> declined", "n_card"),
    # non-PII lookalikes survive
    ("version 1.2.3 of pkg", "version 1.2.3 of pkg", None),
    ("order 12-34 shipped", "order 12-34 shipped", None),
    ("meeting 2024-01-15 at 9", "meeting 2024-01-15 at 9", None),
]


def test_redact_pii_goldens(spark):
    from etly_spark.functions.text import redact_pii

    df = spark.createDataFrame(
        [(i, raw) for i, (raw, _, _) in enumerate(CASES)], "id long, text string"
    )
    cols = redact_pii("text")
    rows = df.select("id", *[v.alias(k) for k, v in cols.items()]).collect()
    by_id = {r["id"]: r for r in rows}
    for i, (raw, want, klass) in enumerate(CASES):
        r = by_id[i]
        assert r["text"] == want, (raw, r["text"])
        if klass:
            assert r[klass] == 1, (raw, klass, r.asDict())
        # nothing else fired
        fired = [k for k in r.asDict() if k.startswith("n_") and r[k] > 0]
        assert fired == ([klass] if klass else []), (raw, fired)


def test_redact_pii_counts_match_replacements(spark):
    """Counts are evaluated on the text as each rule sees it, so
    sum(counts) == number of placeholder tokens in the output."""
    from etly_spark.functions.text import PII_RULES, redact_pii

    text = (
        "a@b.io c@d.org | 123-45-6789 | 10.0.0.1 10.0.0.2 | "
        "555-123-4567 | 1111-2222-3333-4444"
    )
    df = spark.createDataFrame([(text,)], "text string")
    cols = redact_pii("text")
    r = df.select(*[v.alias(k) for k, v in cols.items()]).collect()[0]
    n_placeholders = sum(
        r["text"].count(repl) for _, _, repl in PII_RULES
    )
    assert sum(r[f"n_{name}"] for name, _, _ in PII_RULES) == n_placeholders == 7


def test_config_driven_pii_transfer(spark, tmp_path):
    """'Transformer': 'etly.RedactPII' in a Transfer spec scrubs records
    in flight and lands per-class counts alongside the redacted text."""
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    store = tmp_path / "store"
    rows = [
        (1, "contact alice@example.com or 555-123-4567"),
        (2, "no pii here"),
    ]
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(store / "docs.parquet")
    )
    t = Transfer(
        name="pii-scrub",
        source=Source(
            name="SELECT doc_id, text FROM docs",
            type="datastore",
            ds_config={
                "DriverName": "parquet",
                "Parameters": {"url": f"file://{store}"},
            },
        ),
        target=Target(name=str(tmp_path / "out" / "clean"), data_format="parquet"),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        transformer="etly.RedactPII",
        base_dir=str(tmp_path),
    )
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    back = {r.doc_id: r for r in spark.read.parquet(str(tmp_path / "out" / "clean")).collect()}
    assert back[1].text == "contact <EMAIL> or <PHONE>"
    assert back[1].n_email == 1 and back[1].n_phone == 1 and back[1].n_pii == 2
    assert back[2].text == "no pii here" and back[2].n_pii == 0


def test_rescrub_of_already_scrubbed_data_keeps_unique_columns(spark):
    """Re-running the scrubber over data that already carries the
    n_* / n_pii columns replaces them instead of producing duplicate
    column names (which would break every downstream reference)."""
    from etly_spark import registry

    scrub = registry.transformers.get("etly.RedactPII")
    df = spark.createDataFrame([(1, "a@b.io x")], "doc_id long, text string")
    once = scrub(df)
    twice = scrub(once)
    assert len(twice.columns) == len(set(twice.columns))
    r = twice.collect()[0]
    assert r.text == "<EMAIL> x" and r.n_email == 0 and r.n_pii == 0


from hypothesis import given, settings
from hypothesis import strategies as st


@settings(max_examples=10, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.sampled_from("abz .@-+()0123456789\n"), min_size=0, max_size=80
        ),
        min_size=1,
        max_size=8,
    )
)
def test_redact_pii_properties_arbitrary_text(spark, texts):
    """For ANY input text: the scrubber never crashes, counts are
    non-negative, and the total count equals the number of placeholder
    tokens in the output (counts and replacements always agree)."""
    from etly_spark.functions.text import PII_RULES, redact_pii

    df = spark.createDataFrame([(i, t) for i, t in enumerate(texts)], "id long, text string")
    cols = redact_pii("text")
    rows = df.select("id", *[v.alias(k) for k, v in cols.items()]).collect()
    for r in rows:
        total = sum(r[f"n_{name}"] for name, _, _ in PII_RULES)
        assert total >= 0
        placed = sum(r["text"].count(repl) for _, _, repl in PII_RULES)
        assert total == placed, (r.asDict(),)


def test_builtin_curation_chain_config_only(spark, tmp_path):
    """Filter + transformer both resolved purely by built-in names:
    'etly.QualityGate' drops junk records, 'etly.RedactPII' scrubs the
    survivors — a curation Transfer with zero user code."""
    from etly_spark.config import Resource, Source, Target, Transfer
    from etly_spark.pipeline import DONE, TransferService

    store = tmp_path / "store"
    good = " ".join(f"signal{i}" for i in range(60)) + " contact alice@example.com"
    rows = [(1, good), (2, "junk " * 40)]  # junk: low diversity + short
    spark.createDataFrame(rows, "doc_id long, text string").write.parquet(
        str(store / "docs.parquet")
    )
    t = Transfer(
        name="builtin-chain",
        source=Source(
            name="SELECT doc_id, text FROM docs",
            type="datastore",
            ds_config={"DriverName": "parquet", "Parameters": {"url": f"file://{store}"}},
        ),
        target=Target(name=str(tmp_path / "out" / "clean"), data_format="parquet"),
        meta=Resource(name=str(tmp_path / "out" / "meta.json")),
        filter="etly.QualityGate",
        transformer="etly.RedactPII",
        base_dir=str(tmp_path),
    )
    t.validate()
    result = TransferService(spark).run(t)
    assert result.status == DONE, result.error
    back = {r.doc_id: r for r in spark.read.parquet(str(tmp_path / "out" / "clean")).collect()}
    assert set(back) == {1}  # repetitive low-diversity record gated out
    assert back[1].text.endswith("contact <EMAIL>") and back[1].n_email == 1


def test_normalize_text_builtin(spark):
    from etly_spark import registry

    norm = registry.transformers.get("etly.NormalizeText")
    df = spark.createDataFrame([(1, "  Mixed   CASE\t text \n")], "id long, text string")
    assert norm(df).collect()[0].text == "mixed case text"
