"""PDF text-extraction tests: COS object parser, content-stream text
interpreter, writer round-trip, object streams, malformed-input fuzz,
and the Spark map-side tier."""

from __future__ import annotations

import zlib

import numpy as np
import pytest
from hypothesis import given, settings
from hypothesis import strategies as st

from deltalake2db_spark.operators import pdf as P


def test_writer_parser_roundtrip():
    pages = ["hello world\nsecond line", "page two only line"]
    for compress in (True, False):
        res = P.extract_pdf_text(P.encode_pdf(pages, compress=compress))
        assert res is not None
        assert res["n_pages"] == 2
        assert res["pages"] == pages


def test_string_escapes_roundtrip():
    tricky = ["a(b)c\\d (nested (parens))", "caf\xe9 r\xe9sum\xe9",
              "tab\there"]
    res = P.extract_pdf_text(P.encode_pdf(tricky))
    assert res["pages"] == tricky


def test_hand_written_pdf_tj_hex_utf16():
    """Classic uncompressed PDF exercising TJ kerning (gap < -180 em
    thousandths becomes a space, smaller gaps do not), hex strings,
    UTF-16BE strings, and a /Length that lies (endstream fallback)."""
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length 9999 >>\nstream\n"
        b"BT\n[(Hel) -50 (lo) -300 (world)] TJ\nT*\n<48657821> Tj\n"
        b"T*\n(\xfe\xff\x00A\x00B) Tj\nET\n"
        b"endstream\nendobj\n"
        b"trailer\n<< /Root 1 0 R >>\n%%EOF\n"
    )
    res = P.extract_pdf_text(raw)
    assert res == {"n_pages": 1, "pages": ["Hello world\nHex!\nAB"]}


def test_object_stream_pdf():
    """Modern all-compressed layout: catalog/pages/page live inside a
    /ObjStm; only the content stream is a top-level object."""
    o1 = b"<< /Type /Catalog /Pages 2 0 R >> "
    o2 = b"<< /Type /Pages /Kids [3 0 R] /Count 1 >> "
    o3 = b"<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>"
    hdr = (
        b"1 0 2 " + str(len(o1)).encode()
        + b" 3 " + str(len(o1) + len(o2)).encode() + b" "
    )
    comp = zlib.compress(hdr + o1 + o2 + o3)
    payload = (
        b"%PDF-1.5\n"
        b"5 0 obj\n<< /Type /ObjStm /N 3 /First "
        + str(len(hdr)).encode()
        + b" /Length " + str(len(comp)).encode()
        + b" /Filter /FlateDecode >>\nstream\n" + comp
        + b"\nendstream\nendobj\n"
        b"4 0 obj\n<< /Length 23 >>\nstream\n"
        b"BT (objstm works) Tj ET\nendstream\nendobj\n"
        b"%%EOF\n"
    )
    assert P.extract_pdf_text(payload)["pages"] == ["objstm works"]


def test_contents_array_concatenated():
    """A page whose /Contents is an ARRAY of stream refs concatenates
    them into one logical stream."""
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R "
        b"/Contents [4 0 R 5 0 R] >>\nendobj\n"
        b"4 0 obj\n<< /Length 14 >>\nstream\nBT (part ) Tj\nendstream\n"
        b"endobj\n"
        b"5 0 obj\n<< /Length 14 >>\nstream\n(two) Tj ET\nendstream\n"
        b"endobj\n%%EOF\n"
    )
    assert P.extract_pdf_text(raw)["pages"] == ["part two"]


def test_unsupported_filter_and_non_pdf():
    assert P.extract_pdf_text(b"not a pdf at all") is None
    assert P.extract_pdf_text(b"") is None
    assert P.extract_pdf_text(None) is None
    # DCTDecode content stream -> page extracts as empty, not a crash
    raw = (
        b"%PDF-1.4\n"
        b"1 0 obj\n<< /Type /Catalog /Pages 2 0 R >>\nendobj\n"
        b"2 0 obj\n<< /Type /Pages /Kids [3 0 R] /Count 1 >>\nendobj\n"
        b"3 0 obj\n<< /Type /Page /Parent 2 0 R /Contents 4 0 R >>\n"
        b"endobj\n"
        b"4 0 obj\n<< /Length 4 /Filter /DCTDecode >>\nstream\n\xff\xd8"
        b"\xff\xe0\nendstream\nendobj\n%%EOF\n"
    )
    res = P.extract_pdf_text(raw)
    assert res == {"n_pages": 1, "pages": [""]}


@settings(max_examples=30, deadline=None)
@given(
    texts=st.lists(
        st.text(
            alphabet=st.characters(min_codepoint=32, max_codepoint=255,
                                   exclude_characters="\x7f"),
            min_size=0, max_size=120,
        ),
        min_size=1, max_size=4,
    ),
    compress=st.booleans(),
)
def test_pdf_roundtrip_property(texts, compress):
    """Any latin-1 page text survives encode -> extract (newlines are
    the line structure; other control chars are escaped)."""
    pages = [t.replace("\r", " ") for t in texts]
    res = P.extract_pdf_text(P.encode_pdf(pages, compress=compress))
    assert res is not None
    # the writer renders line-by-line: empty trailing lines collapse
    expect = ["\n".join(x for x in p.split("\n") if x != "")
              for p in pages]
    assert res["pages"] == expect


def test_malformed_pdf_fuzz_never_crashes():
    rng = np.random.RandomState(2)
    valid = P.encode_pdf(["hello world\nsecond line", "page two"])
    for i in range(150):
        buf = bytearray(valid)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 8)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = P.extract_pdf_text(bytes(buf))
        assert out is None or isinstance(out["pages"], list)


@pytest.mark.usefixtures("spark")
def test_extract_pdf_pages_spark(spark):
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                pages = [f"doc {i} page {p}\nline two of page {p}"
                         for p in range(1 + i % 3)]
                rows.append((i, P.encode_pdf(pages)))
            # one deliberately broken payload per batch
            rows.append((9999, b"%PDF-borked"))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    df = spark.range(8).mapInPandas(
        gen, schema="media_id long, payload binary"
    )
    out = P.extract_pdf_pages(df).orderBy("media_id", "page_idx")
    rows = out.collect()
    assert sum(1 for r in rows if r.media_id == 9999) == 0
    expect_rows = sum(1 + i % 3 for i in range(8))
    assert len(rows) == expect_rows
    r0 = rows[0]
    assert r0.text == "doc 0 page 0\nline two of page 0"
    assert r0.n_lines == 2 and r0.n_pages == 1
