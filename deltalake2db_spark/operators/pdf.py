"""PDF text extraction — pure stdlib (zlib) parser + writer.

After HTML (``operators/html.py``) and WARC (``operators/warc.py``),
PDF is the other dominant document source a training-data pipeline
ingests at scale (Common Crawl alone carries billions of PDFs).  This
module implements the extraction path real pipelines use, with no
external dependency:

* **Object scan, not xref walk**: the file is scanned for every
  ``N G obj … endobj`` span and the object map is built directly —
  the strategy production extractors use because real-world xref
  tables are so often broken.  Cross-reference *streams* therefore
  never need parsing; compressed **object streams** (``/Type
  /ObjStm``) ARE parsed, so modern all-compressed PDFs work too.
* **Recursive-descent object parser** for the full COS syntax:
  dicts, arrays, names (with ``#xx`` escapes), literal strings
  (nested parens, octal + all standard escapes, line continuations),
  hex strings, numbers, booleans, null, indirect references.
* **Streams**: ``/Length`` resolved (including indirect), with an
  ``endstream``-search fallback when it lies; ``/FlateDecode``
  (stdlib zlib) supported, other filters fail that stream to None.
* **Page tree walk** from ``/Root`` → ``/Pages`` → ``/Kids`` (depth
  and page-count capped: untrusted input never drives unbounded
  recursion or allocation), falling back to a ``/Type /Catalog``
  scan when the trailer is missing.
* **Content-stream text**: a tokenizer over the page's (possibly
  concatenated) content streams tracks ``BT``/``ET`` text objects and
  interprets ``Tj``, ``'``, ``"``, ``TJ`` (kerning gaps below -180
  thousandths of an em become spaces — the standard word-break
  heuristic), with ``Td``/``TD``/``T*``/``Tm`` as line breaks.
  UTF-16BE strings (BOM ``FE FF``) decode properly; everything else
  is PDFDocEncoding ≈ latin-1.
* ``encode_pdf(pages)``: a correct classic-xref writer (Flate-
  compressed content, standard-14 Helvetica) for fixtures and gates.
* ``extract_pdf_pages(df)``: the Spark tier — ``mapInPandas``
  map-side parse, one row per page, payload bytes never cross a
  shuffle; composes with ``warc_records`` for crawl archives exactly
  like ``html.warc_html_texts``.

Reference scope: the reference engine has no document-ingestion tier
(SURVEY.md §2.5) — north-star extension surface.
"""

from __future__ import annotations

import re
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_MAX_PAGES = 10_000
_MAX_DEPTH = 64
_MAX_OBJECTS = 200_000
_MAX_STREAM = 1 << 28  # 256 MiB inflated, per stream

_WS = b"\x00\t\n\x0c\r "
_DELIM = b"()<>[]{}/%"

_OBJ_RE = re.compile(rb"(\d{1,9})\s+(\d{1,5})\s+obj\b")


class _Ref:
    __slots__ = ("num",)

    def __init__(self, num: int):
        self.num = num

    def __repr__(self):  # pragma: no cover - debug aid
        return f"_Ref({self.num})"


def _skip_ws(buf: bytes, pos: int) -> int:
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in _WS:
            pos += 1
        elif c == 0x25:  # '%' comment to EOL
            while pos < n and buf[pos] not in b"\r\n":
                pos += 1
        else:
            break
    return pos


def _parse_name(buf: bytes, pos: int) -> tuple:
    # pos at '/'
    pos += 1
    out = bytearray(b"/")
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c in _WS or c in _DELIM:
            break
        if c == 0x23 and pos + 2 < n:  # '#xx'
            try:
                out.append(int(buf[pos + 1 : pos + 3], 16))
                pos += 3
                continue
            except ValueError:
                pass
        out.append(c)
        pos += 1
    return out.decode("latin-1"), pos


_ESCAPES = {
    ord("n"): b"\n", ord("r"): b"\r", ord("t"): b"\t",
    ord("b"): b"\b", ord("f"): b"\x0c",
    ord("("): b"(", ord(")"): b")", ord("\\"): b"\\",
}


def _parse_literal_string(buf: bytes, pos: int) -> tuple:
    # pos at '('
    pos += 1
    out = bytearray()
    depth = 1
    n = len(buf)
    while pos < n:
        c = buf[pos]
        if c == 0x5C:  # backslash
            pos += 1
            if pos >= n:
                break
            e = buf[pos]
            if e in _ESCAPES:
                out += _ESCAPES[e]
                pos += 1
            elif 0x30 <= e <= 0x37:  # octal, 1-3 digits
                oct_digits = bytearray()
                while (
                    pos < n and len(oct_digits) < 3
                    and 0x30 <= buf[pos] <= 0x37
                ):
                    oct_digits.append(buf[pos])
                    pos += 1
                out.append(int(oct_digits, 8) & 0xFF)
            elif e in b"\r\n":  # line continuation
                pos += 1
                if e == 0x0D and pos < n and buf[pos] == 0x0A:
                    pos += 1
            else:  # unknown escape: emit the char itself
                out.append(e)
                pos += 1
        elif c == 0x28:
            depth += 1
            out.append(c)
            pos += 1
        elif c == 0x29:
            depth -= 1
            if depth == 0:
                return bytes(out), pos + 1
            out.append(c)
            pos += 1
        else:
            out.append(c)
            pos += 1
    raise ValueError("unterminated string")


def _parse_hex_string(buf: bytes, pos: int) -> tuple:
    # pos at '<' (not '<<')
    end = buf.index(b">", pos + 1)
    hexd = re.sub(rb"[^0-9A-Fa-f]", b"", buf[pos + 1 : end])
    if len(hexd) % 2:
        hexd += b"0"
    return bytes.fromhex(hexd.decode("ascii")), end + 1


_NUM_RE = re.compile(rb"[+-]?(?:\d+\.?\d*|\.\d+)")
_REF_RE = re.compile(rb"(\d{1,9})\s+(\d{1,5})\s+R\b")
_KW_RE = re.compile(rb"[A-Za-z'\"*]+")


def _parse_obj(buf: bytes, pos: int):
    """Parse one COS object at ``pos``; returns (obj, new_pos).
    Raises ValueError on malformed input."""
    pos = _skip_ws(buf, pos)
    if pos >= len(buf):
        raise ValueError("eof")
    c = buf[pos]
    if c == 0x2F:  # /Name
        return _parse_name(buf, pos)
    if c == 0x28:  # (string)
        return _parse_literal_string(buf, pos)
    if c == 0x3C:  # << dict >> or <hex>
        if buf[pos : pos + 2] == b"<<":
            pos += 2
            d = {}
            while True:
                pos = _skip_ws(buf, pos)
                if buf[pos : pos + 2] == b">>":
                    return d, pos + 2
                key, pos = _parse_obj(buf, pos)
                if not isinstance(key, str) or not key.startswith("/"):
                    raise ValueError("dict key not a name")
                val, pos = _parse_obj(buf, pos)
                d[key] = val
        return _parse_hex_string(buf, pos)
    if c == 0x5B:  # [ array ]
        pos += 1
        arr = []
        while True:
            pos = _skip_ws(buf, pos)
            if pos < len(buf) and buf[pos] == 0x5D:
                return arr, pos + 1
            item, pos = _parse_obj(buf, pos)
            arr.append(item)
    m = _REF_RE.match(buf, pos)
    if m:
        return _Ref(int(m.group(1))), m.end()
    m = _NUM_RE.match(buf, pos)
    if m:
        tok = m.group()
        val = float(tok) if b"." in tok else int(tok)
        return val, m.end()
    m = _KW_RE.match(buf, pos)
    if m:
        kw = m.group()
        if kw == b"true":
            return True, m.end()
        if kw == b"false":
            return False, m.end()
        if kw == b"null":
            return None, m.end()
        raise ValueError(f"keyword {kw!r}")
    raise ValueError(f"byte {c:#x}")


def _resolve(obj, objmap, depth: int = 0):
    while isinstance(obj, _Ref) and depth < _MAX_DEPTH:
        entry = objmap.get(obj.num)
        obj = entry[0] if entry is not None else None
        depth += 1
    return obj


def _stream_data(dct, raw: Optional[bytes], objmap) -> Optional[bytes]:
    """Apply the filter chain; None when a filter is unsupported or
    the data is corrupt."""
    if raw is None:
        return None
    filters = _resolve(dct.get("/Filter"), objmap)
    if filters is None:
        return raw
    if not isinstance(filters, list):
        filters = [filters]
    data = raw
    for f in filters:
        f = _resolve(f, objmap)
        if f in ("/FlateDecode", "/Fl"):
            try:
                d = zlib.decompressobj()
                data = d.decompress(data, _MAX_STREAM)
                if d.unconsumed_tail:
                    return None  # exceeds the inflation cap
            except zlib.error:
                return None
        else:
            return None  # unsupported filter (DCT, LZW, ...)
    return data


_STREAM_RE = re.compile(rb"stream(\r\n|\n|\r)")


def _scan_objects(buf: bytes) -> Optional[dict]:
    """Object map {num: (object, raw_stream|None)} built by scanning
    for ``N G obj`` — robust to broken xref tables, then augmented
    with the contents of every /ObjStm."""
    objmap: dict = {}
    for m in _OBJ_RE.finditer(buf):
        if len(objmap) > _MAX_OBJECTS:
            return None
        num = int(m.group(1))
        try:
            obj, pos = _parse_obj(buf, m.end())
        except (ValueError, IndexError):
            continue
        raw = None
        if isinstance(obj, dict):
            sm = _STREAM_RE.match(buf, _skip_ws(buf, pos))
            if sm:
                start = sm.end()
                length = obj.get("/Length")
                if isinstance(length, _Ref):
                    # may reference an object we haven't scanned yet —
                    # use the endstream-search fallback instead
                    length = None
                if isinstance(length, int) and 0 <= length <= len(buf):
                    end = start + length
                    tail = _skip_ws(buf, end)
                    if buf[tail : tail + 9] != b"endstream":
                        length = None
                    else:
                        raw = buf[start:end]
                if raw is None:
                    end = buf.find(b"endstream", start)
                    if end < 0:
                        continue
                    raw = buf[start:end]
                    # strip the EOL that precedes endstream
                    if raw.endswith(b"\r\n"):
                        raw = raw[:-2]
                    elif raw.endswith((b"\n", b"\r")):
                        raw = raw[:-1]
        # latest definition wins (incremental updates append)
        objmap[num] = (obj, raw)
    # expand object streams
    for num in list(objmap):
        obj, raw = objmap[num]
        if not (isinstance(obj, dict) and obj.get("/Type") == "/ObjStm"):
            continue
        data = _stream_data(obj, raw, objmap)
        if data is None:
            continue
        n = _resolve(obj.get("/N"), objmap)
        first = _resolve(obj.get("/First"), objmap)
        if not (isinstance(n, int) and isinstance(first, int)):
            continue
        n = min(n, _MAX_OBJECTS)
        pos = 0
        pairs = []
        try:
            for _ in range(n):
                onum, pos = _parse_obj(data, pos)
                ooff, pos = _parse_obj(data, pos)
                pairs.append((onum, ooff))
            for onum, ooff in pairs:
                if not isinstance(onum, int) or onum in objmap:
                    continue  # direct definitions shadow ObjStm ones
                inner, _ = _parse_obj(data, first + ooff)
                objmap[onum] = (inner, None)
        except (ValueError, IndexError):
            continue
    return objmap or None


def _find_pages(objmap) -> Optional[list]:
    """Page objects in document order via the /Root → /Pages walk,
    falling back to a catalog scan."""
    root = None
    for num, (obj, _raw) in objmap.items():
        if isinstance(obj, dict) and obj.get("/Type") == "/Catalog":
            root = obj
            break
    if root is None:
        return None
    pages_root = _resolve(root.get("/Pages"), objmap)
    out: list = []

    def walk(node, depth):
        if depth > _MAX_DEPTH or len(out) >= _MAX_PAGES:
            return
        node = _resolve(node, objmap)
        if not isinstance(node, dict):
            return
        t = node.get("/Type")
        if t == "/Page":
            out.append(node)
            return
        kids = _resolve(node.get("/Kids"), objmap)
        if isinstance(kids, list):
            for kid in kids:
                walk(kid, depth + 1)

    walk(pages_root, 0)
    return out or None


def _pdf_text_of_string(b: bytes) -> str:
    if b[:2] == b"\xfe\xff":
        try:
            return b[2:].decode("utf-16-be", "replace")
        except Exception:
            return ""
    return b.decode("latin-1")


_TJ_SPACE_THRESHOLD = -180  # thousandths of an em


def _content_text(data: bytes) -> str:
    """Interpret the text-showing subset of the content stream.
    Lines break on Td/TD/T*/Tm/ET; TJ kerning gaps below the
    threshold become spaces."""
    lines: list = []
    cur: list = []
    stack: list = []

    def newline():
        if cur:
            lines.append("".join(cur))
            cur.clear()

    pos = 0
    n = len(data)
    while pos < n:
        pos = _skip_ws(data, pos)
        if pos >= n:
            break
        try:
            obj, pos = _parse_obj(data, pos)
            stack.append(obj)
            continue
        except ValueError:
            pass
        m = _KW_RE.match(data, pos)
        if not m:  # unparseable byte: skip it
            pos += 1
            stack.clear()
            continue
        op = m.group().decode("latin-1")
        pos = m.end()
        if op == "Tj" and stack and isinstance(stack[-1], bytes):
            cur.append(_pdf_text_of_string(stack[-1]))
        elif op == "TJ" and stack and isinstance(stack[-1], list):
            for el in stack[-1]:
                if isinstance(el, bytes):
                    cur.append(_pdf_text_of_string(el))
                elif (
                    isinstance(el, (int, float))
                    and el <= _TJ_SPACE_THRESHOLD
                ):
                    cur.append(" ")
        elif op == "'" and stack and isinstance(stack[-1], bytes):
            newline()
            cur.append(_pdf_text_of_string(stack[-1]))
        elif op == '"' and stack and isinstance(stack[-1], bytes):
            newline()
            cur.append(_pdf_text_of_string(stack[-1]))
        elif op in ("Td", "TD", "T*", "Tm", "ET"):
            newline()
        stack.clear()
    newline()
    return "\n".join(lines)


def extract_pdf_text(payload: bytes) -> Optional[dict]:
    """Parse a PDF and extract its text: ``{n_pages, pages: [str]}``.
    Returns None when the payload is not a parseable PDF — the
    fail-to-None contract of the whole decode tier."""
    if payload is None or not payload.startswith(b"%PDF-"):
        return None
    try:
        objmap = _scan_objects(payload)
        if objmap is None:
            return None
        pages = _find_pages(objmap)
        if pages is None:
            return None
        texts = []
        for page in pages:
            # do NOT fully resolve /Contents — a stream's raw bytes
            # live beside its dict in the objmap, and _resolve would
            # drop them; only unwrap a ref that points at an ARRAY
            contents = page.get("/Contents")
            if isinstance(contents, _Ref):
                entry = objmap.get(contents.num)
                if entry is not None and isinstance(entry[0], list):
                    contents = entry[0]
            chunks = []
            items = (
                contents if isinstance(contents, list) else [contents]
            )
            for item in items:
                item_obj = item
                raw = None
                if isinstance(item, _Ref):
                    entry = objmap.get(item.num)
                    if entry is None:
                        continue
                    item_obj, raw = entry
                if isinstance(item_obj, dict):
                    data = _stream_data(item_obj, raw, objmap)
                    if data is not None:
                        chunks.append(data)
            texts.append(_content_text(b"\n".join(chunks)))
        return {"n_pages": len(texts), "pages": texts}
    except (ValueError, IndexError, RecursionError, MemoryError):
        return None


# ---------------------------------------------------------- writer

def _esc_pdf_string(s: str) -> bytes:
    out = bytearray()
    for b in s.encode("latin-1", "replace"):
        if b in (0x28, 0x29, 0x5C):
            out += b"\\" + bytes([b])
        elif b < 0x20 or b > 0x7E:
            out += b"\\%03o" % b
        else:
            out.append(b)
    return bytes(out)


def encode_pdf(pages, compress: bool = True, title: str = "") -> bytes:
    """Classic-xref PDF writer for fixtures and gates: each element of
    ``pages`` is a page's text (lines split on ``\\n``), rendered in
    standard-14 Helvetica with one ``Tj`` per line and ``T*`` leading.
    Content streams are Flate-compressed by default.  The xref table
    is byte-accurate (a spec-following reader works too, not just the
    scan-based one)."""
    objects: list = []  # (num, bytes-body) in numeric order

    n_pages = len(pages)
    font_num = 3 + 2 * n_pages
    page_nums = [3 + 2 * i for i in range(n_pages)]
    kids = " ".join(f"{p} 0 R" for p in page_nums)
    objects.append((1, f"<< /Type /Catalog /Pages 2 0 R >>".encode()))
    objects.append((
        2,
        (
            f"<< /Type /Pages /Kids [{kids}] /Count {n_pages} >>"
        ).encode(),
    ))
    for i, page_text in enumerate(pages):
        lines = str(page_text).split("\n")
        content = bytearray(b"BT /F1 12 Tf 14 TL 72 720 Td\n")
        for j, line in enumerate(lines):
            if j:
                content += b"T*\n"
            content += b"(" + _esc_pdf_string(line) + b") Tj\n"
        content += b"ET"
        body = bytes(content)
        filt = b""
        if compress:
            body = zlib.compress(body, 6)
            filt = b"/Filter /FlateDecode "
        stream_obj = (
            b"<< " + filt + b"/Length " + str(len(body)).encode()
            + b" >>\nstream\n" + body + b"\nendstream"
        )
        objects.append((
            page_nums[i],
            (
                f"<< /Type /Page /Parent 2 0 R /MediaBox [0 0 612 792] "
                f"/Resources << /Font << /F1 {font_num} 0 R >> >> "
                f"/Contents {page_nums[i] + 1} 0 R >>"
            ).encode(),
        ))
        objects.append((page_nums[i] + 1, stream_obj))
    objects.append((
        font_num,
        b"<< /Type /Font /Subtype /Type1 /BaseFont /Helvetica >>",
    ))
    objects.sort()

    out = bytearray(b"%PDF-1.5\n%\xe2\xe3\xcf\xd3\n")
    offsets = {}
    for num, body in objects:
        offsets[num] = len(out)
        out += f"{num} 0 obj\n".encode() + body + b"\nendobj\n"
    xref_pos = len(out)
    maxnum = objects[-1][0]
    out += f"xref\n0 {maxnum + 1}\n".encode()
    out += b"0000000000 65535 f \n"
    for num in range(1, maxnum + 1):
        out += b"%010d 00000 n \n" % offsets.get(num, 0)
    trailer = f"<< /Size {maxnum + 1} /Root 1 0 R >>"
    out += (
        b"trailer\n" + trailer.encode()
        + b"\nstartxref\n" + str(xref_pos).encode() + b"\n%%EOF\n"
    )
    return bytes(out)


# -------------------------------------------------------- Spark tier

def extract_pdf_pages(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, page_idx, n_pages, n_lines, text) — one row per page of
    every parseable PDF payload, extracted map-side with the pure-
    stdlib parser (``mapInPandas``: raw bytes never cross a shuffle,
    the work distributes with the scan).  Unparseable rows are
    skipped (fail-open screen, like the rest of the decode tier)."""
    out_schema = (
        f"{id_col} long, page_idx int, n_pages int, n_lines int, "
        "text string"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                if payload is None:
                    continue
                res = extract_pdf_text(bytes(payload))
                if res is None:
                    continue
                for j, page in enumerate(res["pages"]):
                    rows.append((
                        int(rid), j, res["n_pages"],
                        page.count("\n") + 1 if page else 0, page,
                    ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "page_idx", "n_pages", "n_lines",
                         "text"],
            )

    from .parallel import kernel_map

    return kernel_map(df, batches, out_schema, cols=(id_col, payload_col))
