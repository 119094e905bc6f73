"""HTML → text extraction, pure stdlib.

The first transformation every web corpus goes through: WARC response
bodies are HTML; training data wants the text. This is a small,
deterministic extractor — a hand-rolled tag scanner (NOT a regex over
`<[^>]*>`, which breaks on `>` inside quoted attribute values), with
script/style/comment elision, entity unescaping via the stdlib `html`
module, and newline injection at block-element boundaries only.

Determinism contract (what the oracle gate leans on, see
queries/multimodal.py 'warc' variant): text content outside any
markup passes through BYTE-EXACT — no whitespace collapsing, no
trimming — and only the tags in _BLOCK_TAGS inject a separator ('\n').
Structural wrappers (html/head/body/span/a/...) inject nothing, so
`html_to_text(wrap(escape(t))) == t` for any t when wrap uses only
non-block structure. Real-world messiness (unclosed tags, attributes
containing '>', CDATA, uppercase tags, numeric entities) is covered in
tests/test_warc_html.py.

Reference parity: none — the reference (viant/etly) has no HTML
handling; SURVEY §2.3 training-data scope.

Scale: pure per-row function, runs inside Arrow-batched stages; O(len)
single pass, no backtracking.
"""

from __future__ import annotations

import html as _html

__all__ = ["escape_html_text", "html_to_text"]

# elements whose CONTENT is dropped entirely
_RAW_SKIP = ("script", "style")
# elements that mark a text-flow break: one '\n' on open AND close
# (browsers render these as blocks; inline/void/structural tags emit
# nothing). `br` and `hr` are void — newline on the tag itself.
_BLOCK_TAGS = frozenset(
    "p div li ul ol tr table h1 h2 h3 h4 h5 h6 blockquote pre hr br "
    "section article header footer form dl dt dd".split()
)


def escape_html_text(text: str) -> str:
    """Minimal-entity escape (the inverse lane of html_to_text for text
    placed in element content): & < > only — exactly the three that are
    unsafe in content position, and exactly what a SQL oracle can
    replicate with three nested replace() calls."""
    return text.replace("&", "&amp;").replace("<", "&lt;").replace(">", "&gt;")


def _tag_end(s: str, i: int) -> int:
    """Index just past the '>' closing the tag that starts at s[i]=='<',
    honoring single/double-quoted attribute values. Returns len(s) if
    the tag never closes (malformed tail: swallow to end, never raise)."""
    n = len(s)
    j = i + 1
    while j < n:
        c = s[j]
        if c == '"' or c == "'":
            k = s.find(c, j + 1)
            if k < 0:
                return n
            j = k + 1
            continue
        if c == ">":
            return j + 1
        j += 1
    return n


def _tag_name(s: str, i: int, end: int) -> str:
    """Lowercased element name of the tag in s[i:end] ('' if none)."""
    j = i + 1
    if j < end and s[j] == "/":
        j += 1
    k = j
    while k < end and (s[k].isalnum() or s[k] in "-_"):
        k += 1
    return s[j:k].lower()


def html_to_text(src: str) -> str:
    """Extract readable text from HTML. Never raises on malformed
    input; unrecognized or torn markup degrades to dropped bytes, text
    content is preserved byte-exact (see module contract)."""
    out: list[str] = []
    i = 0
    n = len(src)
    pending_break = False

    def emit(text: str) -> None:
        nonlocal pending_break
        if not text:
            return
        if pending_break and out:
            out.append("\n")
        pending_break = False
        out.append(text)

    while i < n:
        lt = src.find("<", i)
        if lt < 0:
            emit(_html.unescape(src[i:]))
            break
        if lt > i:
            emit(_html.unescape(src[i:lt]))
        # comment / CDATA / doctype forms
        if src.startswith("<!--", lt):
            end = src.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if src.startswith("<![CDATA[", lt):
            end = src.find("]]>", lt + 9)
            # CDATA content is character data: keep it
            emit(src[lt + 9 : (n if end < 0 else end)])
            i = n if end < 0 else end + 3
            continue
        if src.startswith("<!", lt) or src.startswith("<?", lt):
            i = _tag_end(src, lt)
            continue
        end = _tag_end(src, lt)
        name = _tag_name(src, lt, end)
        if not name:
            # bare '<' in sloppy HTML: character data, keep it
            emit(src[lt : lt + 1])
            i = lt + 1
            continue
        i = end
        if name in _RAW_SKIP and not src.startswith("</", lt):
            # raw-text element: skip to its close tag, drop content
            close = src.lower().find(f"</{name}", i)
            if close < 0:
                break
            i = _tag_end(src, close)
            continue
        if name in _BLOCK_TAGS:
            pending_break = True
    return "".join(out)
