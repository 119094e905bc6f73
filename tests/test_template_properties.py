"""Property-based tests (hypothesis) for the pure-Python template layer —
the test-strategy upgrade over the reference's example-only suite
(SURVEY §5: no property-based testing in viant/etly)."""

from __future__ import annotations

from datetime import datetime, timedelta

from hypothesis import given, settings
from hypothesis import strategies as st

from etly_spark.templates import (
    expand_date,
    expand_file,
    expand_mod,
    expand_target_key,
    expand_vars,
    fnv64,
    java_date_format_to_strftime,
)

# text without template markers (so expansion must be the identity)
plain_text = st.text(
    alphabet=st.characters(blacklist_characters="<>$#", max_codepoint=0x2FF),
    max_size=60,
)


@given(plain_text, st.datetimes())
@settings(max_examples=200, deadline=None)
def test_expansion_is_identity_without_markers(text, ts):
    assert expand_date(text, ts) == text
    assert expand_mod(text, 12345) == text


@given(st.text(max_size=80))
@settings(max_examples=300, deadline=None)
def test_fnv64_matches_reference_algorithm(s):
    """Independent FNV-1 64 implementation (hash = (hash*prime)^byte)."""
    h = 0xCBF29CE484222325
    for byte in s.encode("utf-8"):
        h = (h * 0x100000001B3) % (1 << 64)
        h ^= byte
    signed = h - (1 << 64) if h >= (1 << 63) else h
    assert fnv64(s) == abs(signed)
    assert fnv64(s) >= 0


@given(st.integers(min_value=1, max_value=10**9), st.text(max_size=40))
@settings(max_examples=200, deadline=None)
def test_mod_bucket_in_range(n, fname):
    out = expand_mod("<mod:%d>" % n, fnv64(fname))
    assert 0 <= int(out) < n


@given(st.datetimes(min_value=datetime(1970, 1, 2), max_value=datetime(2200, 1, 1)))
@settings(max_examples=200, deadline=None)
def test_date_roundtrip_parseable(ts):
    out = expand_date("<dateFormat:yyyyMMddHHmmss>", ts)
    back = datetime.strptime(out, "%Y%m%d%H%M%S")
    assert abs(back - ts) < timedelta(seconds=1)  # sub-second truncated


@given(st.sampled_from(["yyyy/MM/dd", "yyyyMMdd-HH", "yy-MM", "HH:mm:ss"]))
def test_java_format_tokens_all_translated(fmt):
    out = java_date_format_to_strftime(fmt)
    for tok in ("yyyy", "yy", "MM", "dd", "HH", "mm", "ss"):
        assert tok not in out.replace("%", "")


@given(
    st.dictionaries(
        st.from_regex(r"\$[a-z]{1,8}", fullmatch=True), st.text(max_size=10), max_size=4
    ),
    plain_text,
)
@settings(max_examples=200, deadline=None)
def test_vars_absent_keys_leave_text_unchanged(variables, text):
    # none of the $keys appear in marker-free text
    assert expand_vars(text, variables) == text


@given(st.from_regex(r"[A-Za-z0-9._-]{1,30}", fullmatch=True))
@settings(max_examples=200, deadline=None)
def test_target_key_deterministic_and_complete(fname):
    url = f"file:///data/in/{fname}"
    k1 = expand_target_key("out/<mod:7>/<file>", url, datetime(2024, 1, 1))
    k2 = expand_target_key("out/<mod:7>/<file>", url, datetime(2024, 1, 1))
    assert k1 == k2  # deterministic
    assert "<" not in k1 and ">" not in k1  # fully expanded
    assert k1.endswith(fname)
    bucket = int(k1.split("/")[1])
    assert bucket == fnv64(fname) % 7


@given(st.text(max_size=30))
@settings(max_examples=200, deadline=None)
def test_expand_file_uses_basename(name):
    out = expand_file("<file>", f"s3://bucket/a/b/{name}")
    assert "/" not in out


@given(st.text(min_size=0, max_size=80))
@settings(max_examples=200)
def test_partition_value_escape_roundtrip(value):
    """The sink finalizers and the stats sidecar rely on Hive-style
    partition-path escaping being a true inverse of Spark's unescape —
    for ANY key value (URLs with '://', timestamps with ':', spaces,
    unicode)."""
    from etly_spark.pipeline import (
        _escape_partition_value,
        _unescape_partition_value,
    )

    escaped = _escape_partition_value(value)
    assert _unescape_partition_value(escaped) == value
    # escaped form is path-safe: no separators or reserved chars left
    assert "/" not in escaped and ":" not in escaped
