"""URL/key template language: the reference's config templating re-expressed.

Supported expressions (reference: util.go:18-120, util_test.go:11-26):

- ``<dateFormat:yyyyMMdd>``  — Java SimpleDateFormat-style timestamp expansion
- ``<mod:N>``                — FNV-1 64-bit hash of the source file name, mod N
- ``<file>``                 — source file basename (transfer_service.go:713-715)
- ``<pwd>``                  — base directory (util.go:110-120)
- ``##env.NAME##`` / ``${env.NAME}`` — environment variables (util.go:55-60)
- ``$var``                   — extracted variables (util.go:244-251)

All driver-side, pure Python: these resolve *paths and routing keys*
before any Spark job starts, which is exactly where they belong — the
expanded dates/buckets become concrete input paths (partition pruning) or
partition columns. Record-level `$var` routing has a Column-expression
twin in etly_spark.functions.
"""

from __future__ import annotations

import os
import re
from datetime import datetime

# FNV-1 64-bit (public domain algorithm, Fowler–Noll–Vo).
# The reference hashes the source *file name* and takes `% N` for
# `<mod:N>` bucketing (util.go:131-139: fnv.New64, negative → abs).
_FNV64_OFFSET = 0xCBF29CE484222325
_FNV64_PRIME = 0x100000001B3
_MASK64 = (1 << 64) - 1


def fnv64(text: str) -> int:
    """FNV-1 64-bit of text, wrapped to Go int64 semantics with abs().

    Golden (util_test.go:17-20):
    fnv64('adlog.perf.log.2017-06-12_02-00.0.i-01972b29fe0657d40.gz') % 40 == 18
    """
    h = _FNV64_OFFSET
    for b in text.encode("utf-8"):
        h = (h * _FNV64_PRIME) & _MASK64
        h ^= b
    # interpret as signed int64; negative → * -1 (Go: int(h.Sum64()))
    if h >= 1 << 63:
        h -= 1 << 64
    return -h if h < 0 else h


# Java SimpleDateFormat → strftime (the token subset that appears in
# configs; toolbox.DateFormatToLayout equivalent).
_JAVA_TOKENS = [
    ("yyyy", "%Y"),
    ("yy", "%y"),
    ("MM", "%m"),
    ("dd", "%d"),
    ("HH", "%H"),
    ("mm", "%M"),
    ("ss", "%S"),
    ("SSS", "%f"),  # ms ≈ µs head; rarely used in paths
]


def java_date_format_to_strftime(fmt: str) -> str:
    out, i = [], 0
    while i < len(fmt):
        for tok, rep in _JAVA_TOKENS:
            if fmt.startswith(tok, i):
                out.append(rep)
                i += len(tok)
                break
        else:
            out.append(fmt[i])
            i += 1
    return "".join(out)


_DATE_RE = re.compile(r"<dateFormat:([^>]{1,64})>")
_MOD_RE = re.compile(r"<mod:(\d{1,10})>")
_ENV_RE = re.compile(r"##env\.([A-Za-z_][A-Za-z0-9_]*)##|\$\{env\.([A-Za-z_][A-Za-z0-9_]*)\}")


def expand_date(text: str, ts: datetime) -> str:
    """Expand every ``<dateFormat:fmt>`` with ts (util.go:27-36,62-86)."""
    return _DATE_RE.sub(lambda m: ts.strftime(java_date_format_to_strftime(m.group(1))), text)


def expand_mod(text: str, hash_value: int) -> str:
    """Expand ``<mod:N>`` → ``hash_value % N`` (util.go:38-52)."""
    return _MOD_RE.sub(lambda m: str(hash_value % int(m.group(1))), text)


def expand_env(text: str) -> str:
    return _ENV_RE.sub(lambda m: os.environ.get(m.group(1) or m.group(2), ""), text)


def expand_pwd(text: str, base_dir: str) -> str:
    if "<pwd>" in text:
        base = base_dir if base_dir.endswith("/") else base_dir + "/"
        text = text.replace("<pwd>", base)
    return text


def expand_file(text: str, source_url: str) -> str:
    """``<file>`` → source basename (transfer_service.go:713-715; util.go:122-129)."""
    name = os.path.basename(source_url.split("?", 1)[0].rstrip("/"))
    return text.replace("<file>", name)


def expand_vars(text: str, variables: dict[str, str]) -> str:
    """Replace extracted ``$var`` keys; keys carry their sigil, longest
    first so ``$batchCount`` wins over ``$batch`` (util.go:244-251)."""
    for k in sorted(variables, key=len, reverse=True):
        if k in text:
            text = text.replace(k, variables[k])
    return text


def expand_source_url_template(text: str, ts: datetime, base_dir: str = ".") -> str:
    """Everything resolvable before looking at data: pwd, env, dates."""
    return expand_date(expand_env(expand_pwd(text, base_dir)), ts)


def expand_target_key(
    template: str,
    source_url: str,
    ts: datetime,
    variables: dict[str, str] | None = None,
    base_dir: str = ".",
) -> str:
    """Full per-source-file target key (transfer_object_service.go:147-161 +
    transfer_service.go:705-717): pwd/env/date, then <mod:N> of the source
    file name's FNV-1 hash, then <file>, then $vars."""
    text = expand_source_url_template(template, ts, base_dir)
    fname = os.path.basename(source_url.split("?", 1)[0].rstrip("/"))
    text = expand_mod(text, fnv64(fname))
    text = expand_file(text, source_url)
    if variables:
        text = expand_vars(text, variables)
    return text
