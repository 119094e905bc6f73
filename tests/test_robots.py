"""RFC 9309 robots.txt matcher: spec examples, precedence, wildcards,
messy-input robustness, and a distributed policy-join usage shape."""

from __future__ import annotations

from hypothesis import given, settings
from hypothesis import strategies as st

from etly_spark.operators.robots import RobotsPolicy, _pattern_match

SPEC = """
# comments are ignored
User-agent: *
Disallow: /private/
Allow: /private/public.html
Disallow: /tmp*
Disallow: /*.json$

User-agent: examplebot
User-agent: otherbot
Disallow:

User-agent: greedybot
Disallow: /
"""


def test_group_selection_longest_agent_match():
    p = RobotsPolicy.parse(SPEC)
    # examplebot group: empty Disallow = allow-all
    assert p.allowed("ExampleBot/2.1", "/private/secret.html")
    # unknown agent falls back to '*'
    assert not p.allowed("randombot", "/private/secret.html")
    # greedybot blocked everywhere
    assert not p.allowed("greedybot", "/")
    assert not p.allowed("greedybot", "/anything")


def test_rule_precedence_most_specific_wins():
    p = RobotsPolicy.parse(SPEC)
    assert not p.allowed("randombot", "/private/a.html")
    # longer Allow beats shorter Disallow
    assert p.allowed("randombot", "/private/public.html")
    # untouched paths default to allowed
    assert p.allowed("randombot", "/public/index.html")


def test_wildcards_and_anchors():
    p = RobotsPolicy.parse(SPEC)
    assert not p.allowed("randombot", "/tmp")
    assert not p.allowed("randombot", "/tmpfiles/x")
    assert not p.allowed("randombot", "/data/feed.json")   # /*.json$
    assert p.allowed("randombot", "/data/feed.json5")      # $ anchors
    assert _pattern_match("/a*b*c$", "/aXXbYYc")
    assert not _pattern_match("/a*b*c$", "/aXXbYYcZ")
    assert _pattern_match("/a*$", "/a/anything")
    assert _pattern_match("", "/whatever")                  # empty Allow


def test_anchored_wildcard_backtracks_to_path_end():
    """RFC 9309: with `$` the final literal is pinned to the END of the
    path, not its first occurrence — '/*.json$' must block
    '/data/feed.json.json' (regression: greedy first-occurrence left
    `pos` before the true end and reported allowed)."""
    assert _pattern_match("/*.json$", "/data/feed.json.json")
    assert _pattern_match("/*.php$", "/a.php.php")
    assert _pattern_match("/*.php$", "/a.php")
    assert not _pattern_match("/*.php$", "/a.php.phpx")
    # repeated trailing literal with middles constrained to the prefix
    assert _pattern_match("/a*b*c$", "/aXcbYc")
    assert not _pattern_match("/a*b*c$", "/acXc")  # no 'b' before final c
    # suffix overlapping the required prefix must not double-count
    assert not _pattern_match("/ab*b$", "/ab")
    assert _pattern_match("/ab*b$", "/abb")
    p = RobotsPolicy.parse("User-agent: *\nDisallow: /*.json$\n")
    assert not p.allowed("anybot", "/data/feed.json.json")
    assert p.allowed("anybot", "/data/feed.jsonl")


def test_unknown_directives_do_not_split_agent_groups():
    """RFC 9309: unrecognized lines (Sitemap, Crawl-delay) MUST be
    ignored — they do not terminate a start-of-group run of
    User-agent lines (regression: 'a' was flushed with empty rules
    and defaulted to allow-all)."""
    p = RobotsPolicy.parse(
        "User-agent: a\n"
        "Sitemap: https://ex.com/sitemap.xml\n"
        "User-agent: b\n"
        "Disallow: /x\n"
    )
    assert not p.allowed("a", "/x/1")
    assert not p.allowed("b", "/x/1")
    assert p.allowed("a", "/y")
    # after rules begin, a directive doesn't resurrect agent collection
    p2 = RobotsPolicy.parse(
        "User-agent: a\nDisallow: /x\nCrawl-delay: 10\nUser-agent: b\nDisallow: /y\n"
    )
    assert not p2.allowed("a", "/x/1")
    assert p2.allowed("a", "/y/1")
    assert not p2.allowed("b", "/y/1")
    assert p2.allowed("b", "/x/1")


def test_allow_wins_length_ties():
    p = RobotsPolicy.parse("User-agent: *\nDisallow: /dir/\nAllow: /dir2/\n")
    assert p.allowed("x", "/dir2/page")
    p2 = RobotsPolicy.parse("User-agent: *\nDisallow: /p\nAllow: /p\n")
    assert p2.allowed("x", "/page")  # tie -> least restrictive


@settings(max_examples=60, deadline=None)
@given(st.text(max_size=400))
def test_parse_never_raises(text):
    p = RobotsPolicy.parse(text)
    p.allowed("anybot", "/x")


_PAT_ALPHA = "ab/.j$*"


@settings(max_examples=400, deadline=None)
@given(
    st.text(alphabet=_PAT_ALPHA, max_size=12),
    st.text(alphabet="ab/.j", max_size=16),
)
def test_pattern_match_equals_regex_model(pattern, path):
    """_pattern_match vs a regex reference model of RFC 9309 pattern
    semantics: literals, '*' = any run, trailing '$' = end anchor ('$'
    anywhere else is a literal). The tiny shared alphabet makes
    repeated-substring collisions (the ADVICE backtracking bug class)
    common rather than rare."""
    import re

    anchored = pattern.endswith("$")
    body = pattern[:-1] if anchored else pattern
    rx = ".*".join(re.escape(part) for part in body.split("*"))
    rx += r"\Z" if anchored else ""
    want = re.match(rx, path) is not None
    assert _pattern_match(pattern, path) == want, (pattern, path)


def test_distributed_policy_join_shape(spark):
    """The usage shape at scale: per-host policies broadcast-joined to
    a URL table, matching inside an Arrow-batched kernel."""
    from pyspark.sql import functions as F

    policies = spark.createDataFrame(
        [("a.com", "User-agent: *\nDisallow: /private/\n"),
         ("b.com", "User-agent: *\nDisallow: /\n")],
        ["host", "robots"],
    )
    urls = spark.createDataFrame(
        [("a.com", "/ok.html"), ("a.com", "/private/x"), ("b.com", "/ok.html")],
        ["host", "path"],
    )

    def gen(batches):
        import pandas as pd

        from etly_spark.operators.robots import RobotsPolicy

        for pdf in batches:
            cache = {}
            out = []
            for host, path, robots in zip(pdf["host"], pdf["path"], pdf["robots"]):
                if host not in cache:
                    cache[host] = RobotsPolicy.parse(robots)
                out.append((host, path, cache[host].allowed("etlybot", path)))
            yield pd.DataFrame(out, columns=["host", "path", "ok"])

    joined = urls.join(F.broadcast(policies), "host")
    got = {
        (r.host, r.path): r.ok
        for r in joined.mapInPandas(
            gen, "host string, path string, ok boolean"
        ).collect()
    }
    assert got == {
        ("a.com", "/ok.html"): True,
        ("a.com", "/private/x"): False,
        ("b.com", "/ok.html"): False,
    }
