"""WARC (ISO 28500 web-archive) ingestion — the Common Crawl entry
point of a training-data pipeline.

Web-scale text corpora START as WARC: crawlers emit request/response
records with WARC named headers, an HTTP message payload, and
(usually) per-record gzip members concatenated into ``.warc.gz``
files.  This module parses that format with the stdlib only:

* ``parse_warc(payload)``: every record's WARC headers + HTTP status/
  content-type + body bytes, from plain or multi-member-gzip input.
* ``warc_records(df)``: the Spark tier — one row per response record
  ``(media_id, record_idx, url, warc_date, status, content_type,
  body_len, text, truncated)`` with the body decoded to text for
  text/* payloads
  (the downstream dedup/quality/lang-id operators take it from
  there).  Map-side mapInPandas over the binary column; only the
  extracted rows leave the scan.
* ``encode_warc(records, gzip_members=...)``: the writer partner
  (fixtures/gates) emitting spec-shaped WARC/1.0 records, optionally
  as concatenated gzip members like real crawlers do.

Scale shape: a 100 TB crawl is millions of ~1 GB .warc.gz shards; a
binary-file DataFrame over them runs this parser embarrassingly
parallel, and everything downstream is the existing text pipeline.
Reference scope: the reference engine has no ingestion tier
(SURVEY.md §2.5); north-star extension.
"""

from __future__ import annotations

import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_MAX_RECORDS = 1 << 20
_MAX_INFLATED_BYTES = 1 << 30  # 1 GiB inflated-bytes floor per payload
# Inflate budget scales with the COMPRESSED input: real .warc.gz text
# shards inflate ~3-5x, so 32x is a generous legitimate-content bound
# while a gzip bomb (~1000x) still hits the cap almost immediately.  A
# fixed 1 GiB alone would silently truncate a legitimate ~1 GB shard
# (3-5 GB inflated); max(floor, ratio * len) keeps small-payload bombs
# capped tightly AND lets big real shards through.
_MAX_INFLATE_RATIO = 32


def _gunzip_members(
    payload: bytes, max_total: int | None = None
) -> tuple[bytes, bool]:
    """Concatenated gzip members -> ``(plaintext, truncated)`` (the
    .warc.gz layout: one member per record).

    Decompression is BUDGETED in actual inflated bytes (same
    discipline as ``archive._zip_members``): crawl shards are
    untrusted input, and an unbudgeted loop would let one gzip-bomb
    member inflate until the executor OOMs.  The default budget is
    ``max(_MAX_INFLATED_BYTES, _MAX_INFLATE_RATIO * len(payload))`` —
    scaled to the input so legitimate multi-GB shards are not silently
    clipped.  On budget exhaustion the decoded prefix is returned with
    ``truncated=True`` — the record parser fail-opens on the truncated
    tail, so well-formed records before the bomb still ingest, and the
    flag surfaces through ``warc_records``'s ``truncated`` column so a
    pipeline can audit what the budget rejected instead of mistaking a
    clipped shard for a clean parse."""
    if max_total is None:
        max_total = max(_MAX_INFLATED_BYTES,
                        _MAX_INFLATE_RATIO * len(payload))
    out = bytearray()
    truncated = False
    pos = 0
    n = len(payload)
    while pos < n:
        d = zlib.decompressobj(wbits=31)
        # bounded inflate: never request more than the remaining
        # budget (+1 so exhaustion is detectable), letting zlib stop
        # mid-member instead of materializing the whole bomb.  The loop
        # keeps draining members even at room == 0 so that trailing
        # members that inflate to ZERO bytes do not flip the flag: the
        # flag must be exactly "the budget clipped at least one byte"
        # (the r15 boundary rule over-reported on [16, 0]-byte members
        # under a 16-byte budget — out == full yet truncated=True)
        room = max_total - len(out)
        out += d.decompress(payload[pos:], room + 1)
        if len(out) > max_total or d.unconsumed_tail:
            # budget hit mid-member (unconsumed_tail holds the rest of
            # the bomb; flush() would ignore the cap) — stop here
            del out[max_total:]
            truncated = True
            break
        out += d.flush()
        used = n - pos - len(d.unused_data)
        if used <= 0:
            break
        pos += used
    return bytes(out), truncated


def parse_warc(
    payload: bytes,
    with_truncated: bool = False,
    max_inflated_bytes: int | None = None,
):
    """WARC bytes (plain or .warc.gz) -> list of records
    ``{headers: {name_lower: value}, http_status, content_type,
    body: bytes}``.  Returns None for non-WARC payloads.

    ``with_truncated=True`` returns ``(records, truncated)`` instead,
    where ``truncated`` reports whether the gzip inflate budget
    clipped the payload (records parsed from the surviving prefix are
    still returned — fail-open — but the caller can tell a clean
    parse from a budget-clipped one)."""
    truncated = False

    def _ret(records):
        return (records, truncated) if with_truncated else records

    if payload is None or len(payload) < 8:
        return _ret(None)
    if payload[:2] == b"\x1f\x8b":
        try:
            payload, truncated = _gunzip_members(
                payload, max_inflated_bytes
            )
        except zlib.error:
            return _ret(None)
    if not payload.startswith(b"WARC/"):
        return _ret(None)
    records = []
    pos = 0
    n = len(payload)
    try:
        while pos < n and len(records) < _MAX_RECORDS:
            # skip inter-record blank lines
            while pos < n and payload[pos : pos + 2] in (b"\r\n", b"\n\n"):
                pos += 2
            while pos < n and payload[pos : pos + 1] in (b"\r", b"\n"):
                pos += 1
            if pos >= n:
                break
            if not payload.startswith(b"WARC/", pos):
                return _ret(records or None)
            hdr_end = payload.find(b"\r\n\r\n", pos)
            sep = 4
            if hdr_end < 0:
                hdr_end = payload.find(b"\n\n", pos)
                sep = 2
            if hdr_end < 0:
                break
            headers = {}
            for line in payload[pos:hdr_end].splitlines()[1:]:
                if b":" not in line:
                    continue
                k, v = line.split(b":", 1)
                headers[k.strip().lower().decode("ascii", "replace")] = (
                    v.strip().decode("utf-8", "replace")
                )
            clen = int(headers.get("content-length", "0"))
            body_start = hdr_end + sep
            body = payload[body_start : body_start + clen]
            pos = body_start + clen
            http_status = None
            content_type = headers.get("content-type", "")
            http_body = body
            if content_type.startswith("application/http"):
                # payload is an HTTP message: parse its status + headers
                he = body.find(b"\r\n\r\n")
                hsep = 4
                if he < 0:
                    he = body.find(b"\n\n")
                    hsep = 2
                if he >= 0:
                    lines = body[:he].splitlines()
                    if lines and lines[0][:5] in (b"HTTP/",):
                        parts = lines[0].split()
                        if len(parts) >= 2 and parts[1].isdigit():
                            http_status = int(parts[1])
                    for line in lines[1:]:
                        if line.lower().startswith(b"content-type:"):
                            content_type = (
                                line.split(b":", 1)[1]
                                .strip()
                                .decode("ascii", "replace")
                            )
                    http_body = body[he + hsep :]
            records.append({
                "headers": headers,
                "http_status": http_status,
                "content_type": content_type,
                "body": http_body,
            })
    except (ValueError, IndexError):
        return _ret(records or None)
    return _ret(records or None)


def sniff_decode(body: bytes, content_type: str = "") -> str:
    """Charset-aware text decode for crawl payloads, the order real
    browsers/crawlers resolve it: BOM, then the ``charset=`` parameter
    of the (HTTP or WARC) content-type header, then an HTML
    ``<meta charset=...>`` / http-equiv scan of the first 2 KB, then
    strict UTF-8 with a cp1252 fallback (the web's dominant
    mislabeling: pages declared — or defaulted — utf-8 that actually
    carry cp1252 bytes; decoding them as cp1252 is what the mojibake
    repair stage would otherwise have to undo)."""
    import re as _re

    if body[:3] == b"\xef\xbb\xbf":
        return body[3:].decode("utf-8", "replace")
    # UTF-32 BOMs first: the UTF-32 LE BOM (FF FE 00 00) starts with
    # the UTF-16 LE BOM bytes, so a 2-byte check alone would decode
    # UTF-32 content as NUL-interleaved UTF-16 garbage.  The length
    # gate (code units are 4 bytes) shrinks the false-positive window
    # for the one ambiguous prefix — a UTF-16 LE page whose first
    # character is U+0000 shares the FF FE 00 00 prefix but is only
    # 4-byte-aligned half the time.
    if len(body) % 4 == 0 and body[:4] in (
        b"\xff\xfe\x00\x00", b"\x00\x00\xfe\xff"
    ):
        return body.decode("utf-32", "replace")
    if body[:2] in (b"\xff\xfe", b"\xfe\xff"):
        return body.decode("utf-16", "replace")
    m = _re.search(r"charset=[\"']?([\w\-]+)", content_type or "", _re.I)
    enc = m.group(1).lower() if m else None
    declared = enc is not None
    if enc is None:
        head = body[:2048].decode("latin-1", "replace").lower()
        m2 = _re.search(r"<meta[^>]+charset=[\"']?([\w\-]+)", head)
        if m2:
            enc = m2.group(1).lower()
            declared = True
    if enc in (None, "utf-8", "utf8"):
        try:
            return body.decode("utf-8")
        except UnicodeDecodeError:
            # cp1252 rescue ONLY for undeclared/defaulted pages (the
            # web's dominant mislabeling).  A page that EXPLICITLY
            # declared utf-8 keeps its declared charset — one stray
            # invalid byte must not mojibake every valid multibyte
            # sequence in the document.
            if declared:
                return body.decode("utf-8", "replace")
            return body.decode("cp1252", "replace")
    try:
        return body.decode(enc, "replace")
    except (LookupError, UnicodeDecodeError):
        return body.decode("utf-8", "replace")


def warc_records(
    df: DataFrame,
    text_only: bool = True,
    record_types: tuple = ("response",),
    decode: str = "utf-8",
    max_inflated_bytes: int | None = None,
) -> DataFrame:
    """(media_id, record_idx, url, warc_date, status, content_type,
    body_len, text, truncated) for the selected record types in WARC
    payloads.
    ``text`` is the UTF-8-decoded body for text/* content types (NULL
    otherwise); ``text_only=True`` keeps only records with text —
    the corpus-ingestion default.

    ``record_types`` selects Common Crawl's three shard families with
    the same reader: ``("response",)`` for .warc.gz (raw HTTP, the
    default), ``("conversion",)`` for .wet.gz (pre-extracted
    text/plain — no HTTP envelope, so ``status`` is NULL), and
    ``("metadata",)`` for .wat.gz (JSON metadata; pair with
    ``F.from_json`` downstream).  ``record_idx`` stays the record's
    position within the payload regardless of the filter.

    ``decode="sniff"`` resolves each body's charset like a browser
    (BOM -> header charset= -> meta tag -> UTF-8 w/ cp1252 fallback,
    see ``sniff_decode``); the default ``"utf-8"`` is
    replacement-decoded UTF-8 (correct for WET, which is UTF-8 by
    spec).

    ``truncated`` is the decompression-budget audit flag: True on
    every row of a payload whose gzip inflate hit the zip-bomb budget
    (``_gunzip_members``) — the surviving prefix's records still
    ingest fail-open, but a 100 TB pipeline can count/quarantine what
    the budget clipped instead of mistaking it for a clean parse.
    ``max_inflated_bytes`` overrides the default scaled budget
    (``max(1 GiB, 32 x compressed_len)``) per deployment."""
    out_schema = (
        "media_id long, record_idx int, url string, warc_date string, "
        "status int, content_type string, body_len long, text string, "
        "truncated boolean"
    )
    if decode not in ("utf-8", "sniff"):
        # fail loudly: any other value (typo, or a caller passing
        # 'latin-1') would otherwise silently fall back to utf-8
        raise ValueError(
            f"decode must be 'utf-8' or 'sniff', got {decode!r}"
        )
    wanted = set(record_types)

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, payload in zip(pdf["media_id"], pdf["payload"]):
                recs, trunc = parse_warc(
                    bytes(payload), with_truncated=True,
                    max_inflated_bytes=max_inflated_bytes,
                )
                if not recs:
                    continue
                for j, r in enumerate(recs):
                    h = r["headers"]
                    if h.get("warc-type") not in wanted:
                        continue
                    base_ct = r["content_type"].split(";")[0].strip()
                    is_text = base_ct.startswith("text/") or base_ct in (
                        "application/json",  # WAT metadata payloads
                        "application/warc-fields",
                    )
                    if not is_text:
                        text = None
                    elif decode == "sniff":
                        text = sniff_decode(r["body"], r["content_type"])
                    else:
                        text = r["body"].decode("utf-8", "replace")
                    if text_only and text is None:
                        continue
                    rows.append((
                        int(mid), j, h.get("warc-target-uri"),
                        h.get("warc-date"), r["http_status"],
                        r["content_type"], len(r["body"]), text,
                        trunc,
                    ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "record_idx", "url", "warc_date",
                         "status", "content_type", "body_len", "text",
                         "truncated"],
            )

    from .parallel import kernel_map

    return kernel_map(df, batches, out_schema, cols=("media_id", "payload"))


# ------------------------------------------------------------- writer


def encode_warc(records: list, gzip_members: bool = True) -> bytes:
    """``[(warc_type, url, date, http_status, content_type, body)]``
    -> WARC/1.0 bytes; ``gzip_members=True`` emits one gzip member
    per record (the real .warc.gz layout)."""
    out = bytearray()
    for i, (wtype, url, date, status, ctype, body) in enumerate(records):
        if isinstance(body, str):
            body = body.encode("utf-8")
        if wtype == "response":
            http = (
                f"HTTP/1.1 {status} OK\r\n"
                f"Content-Type: {ctype}\r\n"
                f"Content-Length: {len(body)}\r\n\r\n"
            ).encode("ascii") + body
            payload_ct = "application/http; msgtype=response"
        else:
            http = body
            payload_ct = ctype
        hdr = (
            "WARC/1.0\r\n"
            f"WARC-Type: {wtype}\r\n"
            f"WARC-Target-URI: {url}\r\n"
            f"WARC-Date: {date}\r\n"
            f"WARC-Record-ID: <urn:uuid:rec-{i}>\r\n"
            f"Content-Type: {payload_ct}\r\n"
            f"Content-Length: {len(http)}\r\n\r\n"
        ).encode("ascii")
        rec = hdr + http + b"\r\n\r\n"
        if gzip_members:
            co = zlib.compressobj(6, zlib.DEFLATED, 31)
            out += co.compress(rec) + co.flush()
        else:
            out += rec
    return bytes(out)


def cdx_records(df: DataFrame, line_col: str = "line") -> DataFrame:
    """Parse Common Crawl CDX(J) index lines — ``urlkey timestamp
    {json}`` — into typed rows: (urlkey, fetch_ts, url, mime, status,
    digest, warc_length, warc_offset, warc_filename).  The CDX index
    is how a pipeline FINDS records inside the petabyte WARC corpus
    before fetching byte ranges, so this is the step ahead of
    ``warc_records``.

    Pure Column algebra: one bounded split + ``from_json`` (CC stores
    every JSON field as a string; numerics cast after).  Scan-speed,
    zero Python; malformed lines yield NULL fields (from_json's
    PERMISSIVE mode), never errors."""
    from pyspark.sql import functions as F

    c = F.col(line_col)
    parts = F.split(c, " ", 3)
    j = F.from_json(
        F.element_at(parts, 3),
        "url string, mime string, status string, digest string, "
        "length string, offset string, filename string",
    )
    return df.select(
        F.element_at(parts, 1).alias("urlkey"),
        F.element_at(parts, 2).alias("fetch_ts"),
        j.url.alias("url"),
        j.mime.alias("mime"),
        j.status.cast("int").alias("status"),
        j.digest.alias("digest"),
        j.length.cast("long").alias("warc_length"),
        j.offset.cast("long").alias("warc_offset"),
        j.filename.alias("warc_filename"),
    )
