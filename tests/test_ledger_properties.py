"""Property-based checks (hypothesis) for the round-6 ledger/staging
primitives — the invariants that must hold for ANY input shape, not
just the fixtures the example tests use."""

from __future__ import annotations

import os

from hypothesis import HealthCheck, given, settings
from hypothesis import strategies as st

from etly_spark.io.staging import _dep_sig
from etly_spark.meta import Meta, ObjectMeta, ProcessedIndex, sidecar_dir
from etly_spark.pipeline import _append_ledger_sidecar

url_st = st.from_regex(r"file:///[a-z]{1,8}/[a-z0-9]{1,12}\.log", fullmatch=True)


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(urls=st.lists(url_st, min_size=1, max_size=40, unique=True), probe_extra=st.lists(url_st, max_size=10))
def test_index_membership_is_exact(tmp_path_factory, urls, probe_extra):
    """For any recorded URL set U and probe set P:
    processed_among(P) == U ∩ P — never over- or under-reports."""
    base = tmp_path_factory.mktemp("idx")
    meta_url = str(base / "meta.json")
    entries = [ObjectMeta(source=u, record_processed=1) for u in urls]
    _append_ledger_sidecar(sidecar_dir(meta_url), "2017-06-12T00:00:00", entries)
    probe = set(probe_extra) | set(urls[::2])
    got = ProcessedIndex(meta_url).processed_among(probe)
    assert got == set(urls) & probe


@settings(max_examples=20, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(
    entries=st.lists(
        st.tuples(url_st, st.integers(min_value=0, max_value=99)),
        min_size=1,
        max_size=30,
        unique_by=lambda t: t[0],
    ),
    cap=st.integers(min_value=1, max_value=10),
)
def test_json_bound_keeps_most_recent(tmp_path_factory, entries, cap):
    """For any entry set and cap: the saved JSON holds exactly the cap
    most-recent entries by timestamp (ISO strings sort chronologically)."""
    import json as _json

    from etly_spark import meta as meta_mod

    base = tmp_path_factory.mktemp("meta")
    meta_url = str(base / "meta.json")
    m = Meta(url=meta_url)
    for u, sec in entries:
        m.record(ObjectMeta(source=u, timestamp=f"2017-06-12T00:00:{sec:02d}"))
    orig = meta_mod.MAX_JSON_PROCESSED
    meta_mod.MAX_JSON_PROCESSED = cap
    try:
        m.save()
    finally:
        meta_mod.MAX_JSON_PROCESSED = orig
    saved = _json.load(open(meta_url))["Processed"]
    assert len(saved) == min(cap, len(entries))
    kept_ts = sorted(v["timestamp"] for v in saved.values())
    all_ts = sorted(f"2017-06-12T00:00:{sec:02d}" for _, sec in entries)
    assert kept_ts == all_ts[-len(saved):]


@settings(max_examples=25, deadline=None, suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(content=st.binary(min_size=0, max_size=64), rename=st.booleans())
def test_dep_fingerprint_tracks_content_identity(tmp_path_factory, content, rename):
    """_dep_sig changes iff (path, size, mtime) changes: same bytes at
    the same path → same signature; appended bytes → different."""
    base = tmp_path_factory.mktemp("dep")
    p = base / ("a.bin" if not rename else "b.bin")
    p.write_bytes(content)
    s1 = _dep_sig(str(p))
    assert _dep_sig(str(p)) == s1  # stable across calls
    os.utime(p, ns=(1_000_000_000, 1_000_000_000))
    s2 = _dep_sig(str(p))
    assert s2 != s1 or p.stat().st_mtime_ns == 1_000_000_000
    p.write_bytes(content + b"x")
    assert _dep_sig(str(p)) != s2  # size change always flips
