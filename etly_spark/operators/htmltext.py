"""HTML → text extraction, pure stdlib.

The first transformation every web corpus goes through: WARC response
bodies are HTML; training data wants the text. This is a small,
deterministic extractor — a hand-rolled tag scanner (NOT a regex over
`<[^>]*>`, which breaks on `>` inside quoted attribute values), with
script/style/comment elision, entity unescaping via the stdlib `html`
module, and newline injection at block-element boundaries only.

Two consumers share the scanner:

- `html_to_text` — full-fidelity extraction. Determinism contract
  (what the oracle gate leans on, see queries/multimodal.py 'warc'
  variant): text content outside any markup passes through BYTE-EXACT
  — no whitespace collapsing, no trimming — and only the tags in
  _BLOCK_TAGS inject a separator ('\n'). Structural wrappers
  (html/head/body/span/a/...) inject nothing, so
  `html_to_text(wrap(escape(t))) == t` for any t when wrap uses only
  non-block structure.
- `extract_main_text` — boilerplate removal (the jusText/boilerpipe
  heuristic family, public knowledge): segment the page at block
  boundaries, drop chrome subtrees (nav/aside/footer/header), drop
  link-dense segments (menus, related-links), drop short fragments
  that don't read as sentences. Heuristic by nature → pytest-covered,
  not oracle-gated.

Real-world messiness (unclosed tags, attributes containing '>', CDATA,
uppercase tags, numeric entities) is covered in tests/test_warc_html.py.

Reference parity: none — the reference (viant/etly) has no HTML
handling; SURVEY §2.3 training-data scope.

Scale: pure per-row functions, run inside Arrow-batched stages; O(len)
single pass, no backtracking.
"""

from __future__ import annotations

import html as _html

__all__ = ["escape_html_text", "extract_main_text", "html_to_text"]

# elements whose CONTENT is dropped entirely
_RAW_SKIP = ("script", "style")
# elements that mark a text-flow break: one '\n' on open AND close
# (browsers render these as blocks; inline/void/structural tags emit
# nothing). `br` and `hr` are void — newline on the tag itself.
_BLOCK_TAGS = frozenset(
    "p div li ul ol tr table h1 h2 h3 h4 h5 h6 blockquote pre hr br "
    "section article header footer form dl dt dd".split()
)
# subtrees that are site chrome, not content (extract_main_text only)
_CHROME_TAGS = frozenset("nav aside footer header".split())


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


def _scan(src: str):
    """Single-pass tokenizer: yields ('text', payload, needs_unescape)
    and ('tag', name, is_close) events. Comments/doctype/PI produce no
    events; raw-text elements (script/style) skip their content; never
    raises on malformed input (torn markup degrades to dropped bytes)."""
    i = 0
    n = len(src)
    low: str | None = None  # lazily lowercased ONCE (not per script tag)
    while i < n:
        lt = src.find("<", i)
        if lt < 0:
            yield ("text", src[i:], True)
            break
        if lt > i:
            yield ("text", src[i:lt], True)
        if src.startswith("<!--", lt):
            end = src.find("-->", lt + 4)
            i = n if end < 0 else end + 3
            continue
        if src.startswith("<![CDATA[", lt):
            end = src.find("]]>", lt + 9)
            # CDATA content is character data: keep it, no unescape
            yield ("text", src[lt + 9 : (n if end < 0 else end)], False)
            i = n if end < 0 else end + 3
            continue
        if src.startswith("<!", lt) or src.startswith("<?", lt):
            i = _tag_end(src, lt)
            continue
        end = _tag_end(src, lt)
        name = _tag_name(src, lt, end)
        if not name:
            # bare '<' in sloppy HTML: character data, keep it
            yield ("text", "<", False)
            i = lt + 1
            continue
        is_close = src.startswith("</", lt)
        i = end
        if name in _RAW_SKIP and not is_close:
            # raw-text element: skip to its close tag, drop content
            if low is None:
                low = src.lower()
            close = low.find(f"</{name}", i)
            if close < 0:
                return
            i = _tag_end(src, close)
            continue
        yield ("tag", name, is_close)


def html_to_text(src: str) -> str:
    """Extract readable text from HTML. Never raises on malformed
    input; unrecognized or torn markup degrades to dropped bytes, text
    content is preserved byte-exact (see module contract)."""
    out: list[str] = []
    pending_break = False
    for kind, payload, flag in _scan(src):
        if kind == "text":
            text = _html.unescape(payload) if flag else payload
            if not text:
                continue
            if pending_break and out:
                out.append("\n")
            pending_break = False
            out.append(text)
        elif payload in _BLOCK_TAGS:
            pending_break = True
    return "".join(out)


def extract_main_text(
    src: str, min_chars: int = 25, max_link_density: float = 0.34
) -> str:
    """Boilerplate-removing extraction: the page's MAIN text, for
    training corpora (what WET-style pipelines actually want — menus,
    nav bars, footers and related-links boxes are noise that poisons
    dedup and quality scoring).

    Heuristics (jusText/boilerpipe family, deterministic):
    - chrome subtrees (<nav>/<aside>/<footer>/<header>) are dropped
      whole (depth-tracked; malformed nesting can't underflow);
    - the page is segmented at block boundaries; a segment whose
      link-text density exceeds ``max_link_density`` is dropped (link
      farms, menus);
    - segments shorter than ``min_chars`` are dropped unless they end
      like a sentence ('.', '!', '?', '"') — isolated labels and
      button text go, short closing sentences stay.

    Falls back to full `html_to_text` when nothing survives (a page
    that is all short fragments is better kept whole than dropped).
    Never raises on malformed input."""
    segs: list[tuple[str, int, bool]] = []
    buf: list[str] = []
    link_chars = 0
    chrome_depth = 0
    link_depth = 0

    def flush() -> None:
        nonlocal buf, link_chars
        text = "".join(buf).strip()
        if text:
            segs.append((text, link_chars, chrome_depth > 0))
        buf = []
        link_chars = 0

    for kind, payload, flag in _scan(src):
        if kind == "text":
            text = _html.unescape(payload) if flag else payload
            if not text:
                continue
            buf.append(text)
            if link_depth:
                link_chars += len(text)
        else:
            name, is_close = payload, flag
            if name == "a":
                link_depth = max(0, link_depth + (-1 if is_close else 1))
            if name in _CHROME_TAGS:
                flush()  # text before the boundary keeps ITS depth
                chrome_depth = max(0, chrome_depth + (-1 if is_close else 1))
            elif name in _BLOCK_TAGS:
                flush()
    flush()

    kept = []
    for text, lchars, is_chrome in segs:
        if is_chrome:
            continue
        if lchars / max(len(text), 1) > max_link_density:
            continue
        if len(text) < min_chars and not text.rstrip().endswith(
            (".", "!", "?", '"')
        ):
            continue
        kept.append(text)
    return "\n".join(kept) if kept else html_to_text(src).strip()
