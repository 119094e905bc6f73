"""URL analysis columns for crawl curation — engine-portable.

Per-domain statistics, host-level sampling caps, and URL-keyed dedup
are standard web-corpus curation steps (a handful of hosts dominate
any crawl; curation wants to see and bound that). These are pure
column expressions (codegen'd, zero Python), and each has an exact
DuckDB twin using the same RE2-compatible patterns — the catalog's
`text_top_terms:'hosts'` variant hash-gates `url_host` end-to-end.

Semantics (documented, deterministic):
- scheme is anything matching `^[A-Za-z][A-Za-z0-9+.-]*://` and is
  stripped; scheme-less inputs are treated as starting at the host;
- host = chars up to the first `/ ? #`, lowercased, `:port` suffix
  stripped (an IPv6 literal keeps its brackets), leading `www.`
  stripped;
- path = `/...` up to `? #` ('' when absent); query = after `?` up to
  `#` ('' when absent).

Reference parity: none (the reference has no URL functions); SURVEY
§2.3 training-data scope.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

__all__ = ["url_host", "url_path", "url_query"]

_SCHEME_RE = r"^[A-Za-z][A-Za-z0-9+.\-]*://"


def _after_scheme(col) -> Column:
    return F.regexp_replace(col, _SCHEME_RE, "")


def url_host(col) -> Column:
    """Canonical host: lowercased, port and leading www. stripped.
    DuckDB twin: regexp_replace(lower(regexp_replace(regexp_extract(
    regexp_replace(u,'^[A-Za-z][A-Za-z0-9+.\\-]*://',''),
    '^([^/?#]*)',1),':[0-9]+$','')),'^www\\.','')."""
    hostport = F.regexp_extract(_after_scheme(col), r"^([^/?#]*)", 1)
    host = F.lower(F.regexp_replace(hostport, r":[0-9]+$", ""))
    return F.regexp_replace(host, r"^www\.", "")


def url_path(col) -> Column:
    """The `/...` path component, '' when absent (query/fragment cut)."""
    return F.regexp_extract(_after_scheme(col), r"^[^/?#]*(/[^?#]*)", 1)


def url_query(col) -> Column:
    """The query string after `?` (fragment cut), '' when absent.
    A '?' inside the fragment (SPA hash-routing: `/#/path?x=1`) is NOT
    a query — the lazy `^[^#]*?` prefix keeps the match left of `#`."""
    return F.regexp_extract(col, r"^[^#]*?\?([^#]*)", 1)
