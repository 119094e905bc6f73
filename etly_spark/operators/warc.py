"""Pure-stdlib WARC (Web ARChive, ISO 28500 / WARC 1.1) codec.

The WARC container is how web-scale text corpora actually arrive
(Common Crawl publishes ~100 TB/crawl as `.warc.gz`), so a training-
data engine needs a real reader. This is a from-scratch implementation
of the public spec — record grammar `WARC/1.x CRLF header-fields CRLF
block CRLF CRLF`, LWS header continuation lines, Content-Length octet
framing — plus the Common Crawl convention of ONE GZIP MEMBER PER
RECORD (members concatenate by RFC 1952, which is what makes a 1 GB
warc.gz seekable per record and lets us decompress member-at-a-time
with bounded state).

An encoder twin (`encode_warc`) exists for the same reason every codec
here has one: round-trip tests and the cross-engine oracle gate need
bytes we can also reason about arithmetically (see
queries/multimodal.py 'warc' variant).

Reference parity note: the reference engine (viant/etly) has no WARC
support — this is SURVEY §2.3 training-data scope, not a ported
operator. Its closest analogue is the gzip object codec at
transfer_service.go:718-737.

Scale: one object is one executor task holding the uncompressed shard
in memory (capped by `decode_warc`'s bomb guard, default 4 GiB) —
crawl corpora shard ~1 GiB objects precisely so the object is the unit
of parallelism. A malformed record raises ValueError, so pipeline
fault isolation attributes the object exactly like a truncated gzip.
"""

from __future__ import annotations

import gzip
import io
import zlib

__all__ = [
    "WarcRecord",
    "decode_warc",
    "decode_warc_index",
    "encode_warc",
    "split_http_response",
]

_CRLF = b"\r\n"
# Order is part of the encoder contract (the oracle computes record
# lengths from it); parsers must accept any order per spec.
_HEADER_ORDER = (
    "WARC-Type",
    "WARC-Record-ID",
    "WARC-Date",
    "WARC-Target-URI",
    "Content-Type",
)


class WarcRecord:
    """One parsed record: `version` (e.g. 'WARC/1.1'), `headers`
    (name → value, names case-preserved; lookups via `get` are
    case-insensitive per spec), `block` (the Content-Length octets)."""

    __slots__ = ("version", "headers", "block")

    def __init__(self, version: str, headers: dict[str, str], block: bytes):
        self.version = version
        self.headers = headers
        self.block = block

    def get(self, name: str, default: str | None = None) -> str | None:
        low = name.lower()
        for k, v in self.headers.items():
            if k.lower() == low:
                return v
        return default

    @property
    def warc_type(self) -> str | None:
        return self.get("WARC-Type")


def encode_warc(
    records: list[tuple[dict[str, str], bytes]],
    per_record_gzip: bool = False,
) -> bytes:
    """Serialize (headers, block) pairs into a WARC stream.

    Content-Length is computed here (callers must not pass it).
    `per_record_gzip=True` emits the Common Crawl shape: each record
    its own gzip member, members concatenated (mtime pinned to 0 so
    output bytes are deterministic for the oracle gate)."""
    out = io.BytesIO()
    for headers, block in records:
        rec = io.BytesIO()
        rec.write(b"WARC/1.1" + _CRLF)
        emitted = set()
        for name in _HEADER_ORDER:
            for k, v in headers.items():
                if k.lower() == name.lower():
                    rec.write(f"{name}: {v}".encode() + _CRLF)
                    emitted.add(k)
        for k, v in headers.items():
            if k not in emitted and k.lower() != "content-length":
                rec.write(f"{k}: {v}".encode() + _CRLF)
        rec.write(f"Content-Length: {len(block)}".encode() + _CRLF)
        rec.write(_CRLF)
        rec.write(block)
        rec.write(_CRLF + _CRLF)
        raw = rec.getvalue()
        if per_record_gzip:
            out.write(gzip.compress(raw, mtime=0))
        else:
            out.write(raw)
    return out.getvalue()


def _gunzip_members(data: bytes, max_bytes: int) -> bytes:
    """Decompress ALL gzip members of `data` (RFC 1952 concatenation —
    the per-record-gzip warc shape), bounded by ``max_bytes`` — the
    same decompression-bomb guard the lz4/snappy codecs take (a 10 MB
    hostile gzip expands ~1000x unbounded). Raises ValueError on
    trailing garbage, a torn member, or cap breach."""
    out = io.BytesIO()
    total = 0
    rest = data
    while rest:
        d = zlib.decompressobj(wbits=31)
        try:
            chunk = d.decompress(rest, max_bytes - total + 1)
        except zlib.error as e:
            # contract: every malformed-input path raises ValueError
            raise ValueError(f"corrupt gzip member in warc stream: {e}") from e
        total += len(chunk)
        if total > max_bytes:
            raise ValueError(f"warc: decompressed stream exceeds {max_bytes} bytes")
        out.write(chunk)
        if d.unconsumed_tail:
            # cap not yet hit but decompress stopped: only possible at
            # the cap boundary; the check above already raised
            raise ValueError("warc: decompressed stream exceeds cap")
        if not d.eof:
            raise ValueError("truncated gzip member in warc stream")
        out.write(d.flush())
        rest = d.unused_data
    return out.getvalue()


def decode_warc(
    data: bytes, max_decompressed: int = 1 << 32
) -> list[WarcRecord]:
    """Parse a WARC stream (gzipped — single- or per-record-member — or
    plain) into records. Strict: bad version line, non-numeric or lying
    Content-Length, missing record terminator, torn gzip, or a
    decompressed size past ``max_decompressed`` (default 4 GiB — the
    bomb guard) all raise ValueError; fault isolation wants loud,
    attributable failures.

    Memory: O(uncompressed shard) — the whole stream is materialized
    (capped by ``max_decompressed``), which is the operating point for
    crawl shards sized ~1 GiB precisely so one object fits one task."""
    if data[:2] == b"\x1f\x8b":
        data = _gunzip_members(data, max_decompressed)
    return [r for _, _, r in _parse_with_spans(data)]


def _parse_with_spans(data: bytes) -> list[tuple[int, int, WarcRecord]]:
    """The record parser, span-aware: returns (start, end, record) with
    start/end byte offsets of each record within the UNCOMPRESSED
    stream (end includes the CRLFCRLF terminator)."""
    records: list[tuple[int, int, WarcRecord]] = []
    pos = 0
    n = len(data)
    while pos < n:
        # inter-record CRLFs are tolerated (some writers pad)
        while data[pos : pos + 2] == _CRLF:
            pos += 2
        if pos >= n:
            break
        start = pos
        eol = data.find(_CRLF, pos)
        if eol < 0:
            raise ValueError("warc: truncated version line")
        version = data[pos:eol].decode("ascii", "replace")
        if not version.startswith("WARC/"):
            raise ValueError(f"warc: bad version line {version!r}")
        pos = eol + 2
        headers: dict[str, str] = {}
        last_name: str | None = None
        while True:
            eol = data.find(_CRLF, pos)
            if eol < 0:
                raise ValueError("warc: truncated header block")
            line = data[pos:eol]
            pos = eol + 2
            if line == b"":
                break
            if line[:1] in (b" ", b"\t"):
                # LWS continuation folds into the previous field value
                if last_name is None:
                    raise ValueError("warc: continuation before any header")
                headers[last_name] += " " + line.strip().decode("utf-8", "replace")
                continue
            sep = line.find(b":")
            if sep < 0:
                raise ValueError(f"warc: malformed header line {line[:40]!r}")
            name = line[:sep].decode("ascii", "replace").strip()
            headers[name] = line[sep + 1 :].strip().decode("utf-8", "replace")
            last_name = name
        length_s = None
        for k, v in headers.items():
            if k.lower() == "content-length":
                length_s = v
        if length_s is None or not length_s.isdigit():
            raise ValueError(f"warc: bad Content-Length {length_s!r}")
        length = int(length_s)
        if pos + length > n:
            raise ValueError("warc: block extends past end of stream")
        block = data[pos : pos + length]
        pos += length
        if data[pos : pos + 4] != _CRLF + _CRLF:
            raise ValueError("warc: missing record terminator")
        pos += 4
        records.append((start, pos, WarcRecord(version, headers, block)))
    if not records:
        raise ValueError("warc: empty stream")
    return records


def decode_warc_index(
    data: bytes, max_decompressed: int = 1 << 32
) -> list[dict]:
    """CDX-style random-access index: one entry per record with the
    byte range needed to fetch THAT record alone — how web-scale crawls
    are actually consumed (Common Crawl publishes exactly this shape so
    a 1 GiB shard serves single pages via HTTP range-GETs).

    Per record: ``offset``/``length`` — for gzipped shards the
    COMPRESSED byte range of the gzip member holding the record (a
    range-GET of those bytes gunzips to the record; per-record-gzip
    makes that range minimal, a whole-stream gzip degrades to every
    record mapping to the full file — still correct, just not
    selective); for plain shards the record's span in the stream
    itself; ``compressed`` says which. Plus uri/date/type and
    ``digest`` — sha1 of the record block in the Base32 form CDX files
    use (stdlib hashlib+base64; public convention)."""
    import base64
    import hashlib

    out: list[dict] = []

    def entry(rec: WarcRecord, offset: int, length: int, compressed: bool) -> dict:
        return {
            "offset": offset,
            "length": length,
            "compressed": compressed,
            "uri": rec.get("WARC-Target-URI"),
            "date": rec.get("WARC-Date"),
            "warc_type": rec.warc_type,
            "digest": "sha1:"
            + base64.b32encode(hashlib.sha1(rec.block).digest()).decode("ascii"),
        }

    if data[:2] == b"\x1f\x8b":
        pos = 0
        n = len(data)
        while pos < n:
            d = zlib.decompressobj(wbits=31)
            try:
                member = d.decompress(data[pos:], max_decompressed + 1)
            except zlib.error as e:
                raise ValueError(f"corrupt gzip member in warc stream: {e}") from e
            if len(member) > max_decompressed:
                raise ValueError("warc: decompressed member exceeds cap")
            if not d.eof:
                raise ValueError("truncated gzip member in warc stream")
            member += d.flush()
            end = n - len(d.unused_data)
            for _, _, rec in _parse_with_spans(member):
                # per-record gzip puts ONE record per member (the
                # Common Crawl shape); a multi-record member still
                # indexes correctly — every record of the member maps
                # to the member's compressed range
                out.append(entry(rec, pos, end - pos, True))
            pos = end
        if not out:
            raise ValueError("warc: empty stream")
        return out
    for start, end, rec in _parse_with_spans(data):
        out.append(entry(rec, start, end - start, False))
    return out


def fetch_indexed_record(ranged: bytes, *, compressed: bool) -> WarcRecord:
    """Decode the record a CDX entry points at from its ranged bytes —
    the consumer half of ``decode_warc_index``: ``ranged`` is the
    offset/length slice (what an HTTP range-GET returns), so random
    access to one page costs one range read + one gunzip, never a
    shard scan. A plain-shard range is the record itself; a gzipped
    range is the member holding it. Multi-record members (whole-stream
    gzip degradation) return the FIRST record; selective access needs
    per-record-gzip shards — the documented CDX caveat."""
    recs = decode_warc(ranged) if compressed else [
        rec for _, _, rec in _parse_with_spans(ranged)
    ]
    if not recs:
        raise ValueError("warc: ranged bytes hold no record")
    return recs[0]


def read_record_at(path: str, offset: int, length: int, *, compressed: bool) -> WarcRecord:
    """Local-file convenience over ``fetch_indexed_record``: seek +
    bounded read (the filesystem stand-in for a range-GET; an object
    store swaps in `Range: bytes=offset-offset+length-1`)."""
    with open(path, "rb") as fh:
        fh.seek(offset)
        return fetch_indexed_record(fh.read(length), compressed=compressed)


def split_http_response(block: bytes) -> tuple[int, dict[str, str], bytes]:
    """Split an `application/http; msgtype=response` block into
    (status_code, headers, body). Strict on the status line and the
    header/body CRLFCRLF boundary; tolerates LF-only separators some
    crawlers emit (returns the body octets untouched either way)."""
    sep = block.find(b"\r\n\r\n")
    seplen = 4
    if sep < 0:
        sep = block.find(b"\n\n")
        seplen = 2
    if sep < 0:
        raise ValueError("http: no header/body separator")
    head = block[:sep].decode("iso-8859-1")
    lines = head.replace("\r\n", "\n").split("\n")
    parts = lines[0].split(None, 2)
    if len(parts) < 2 or not parts[0].startswith("HTTP/") or not parts[1].isdigit():
        raise ValueError(f"http: bad status line {lines[0]!r}")
    status = int(parts[1])
    headers: dict[str, str] = {}
    last = None
    for line in lines[1:]:
        if not line:
            continue
        if line[:1] in (" ", "\t") and last is not None:
            headers[last] += " " + line.strip()
            continue
        k, _, v = line.partition(":")
        headers[k.strip()] = v.strip()
        last = k.strip()
    return status, headers, block[sep + seplen :]
