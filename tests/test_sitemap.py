"""Sitemap XML + CDX index parsing tests."""

from __future__ import annotations

import gzip

import numpy as np
import pytest

from deltalake2db_spark.operators.sitemap import (
    encode_sitemap,
    parse_sitemap,
    sitemap_entries,
)


def test_urlset_roundtrip_and_gzip():
    entries = [
        {"loc": "https://ex.test/a", "lastmod": "2024-01-02",
         "changefreq": "daily", "priority": "0.8"},
        {"loc": "https://ex.test/b"},
    ]
    for gz in (False, True):
        parsed = parse_sitemap(encode_sitemap(entries, gz=gz))
        assert parsed["kind"] == "urlset"
        assert len(parsed["entries"]) == 2
        assert parsed["entries"][0]["loc"] == "https://ex.test/a"
        assert parsed["entries"][0]["priority"] == "0.8"
        assert parsed["entries"][1]["lastmod"] is None


def test_sitemapindex_and_namespace_agnosticism():
    idx = parse_sitemap(encode_sitemap(
        [{"loc": "https://ex.test/sm1.xml"}], kind="sitemapindex"
    ))
    assert idx["kind"] == "sitemapindex"
    assert idx["entries"][0]["loc"] == "https://ex.test/sm1.xml"
    # no namespace at all still parses (localname match)
    raw = b"<urlset><url><loc>https://x/a</loc></url></urlset>"
    assert parse_sitemap(raw)["entries"][0]["loc"] == "https://x/a"
    # foreign namespace prefix
    raw = (b'<sm:urlset xmlns:sm="http://other/ns"><sm:url>'
           b"<sm:loc>https://x/b</sm:loc></sm:url></sm:urlset>")
    assert parse_sitemap(raw)["entries"][0]["loc"] == "https://x/b"


def test_malformed_sitemaps_fail_to_none():
    assert parse_sitemap(None) is None
    assert parse_sitemap(b"") is None
    assert parse_sitemap(b"not xml at all") is None
    assert parse_sitemap(b"<rss><item/></rss>") is None  # wrong root
    assert parse_sitemap(b"<urlset><url><loc>x</loc>") is None
    rng = np.random.RandomState(0)
    valid = encode_sitemap([{"loc": "https://x/a"}], gz=True)
    for i in range(100):
        buf = bytearray(valid)
        if i % 3 == 0:
            buf = buf[: rng.randint(1, len(buf))]
        else:
            for _ in range(rng.randint(1, 5)):
                buf[rng.randint(0, len(buf))] = rng.randint(0, 256)
        out = parse_sitemap(bytes(buf))
        assert out is None or isinstance(out["entries"], list)


def test_sitemap_entries_spark(spark):
    import pandas as pd

    def gen(it):
        for pdf in it:
            rows = []
            for i in pdf["id"]:
                i = int(i)
                rows.append((i, encode_sitemap(
                    [{"loc": f"https://h{i}.test/p{k}",
                      "priority": "0.5"} for k in range(2)]
                )))
            rows.append((99, b"garbage"))
            yield pd.DataFrame(rows, columns=["media_id", "payload"])

    df = spark.range(4).mapInPandas(
        gen, schema="media_id long, payload binary"
    )
    rows = sitemap_entries(df).orderBy("media_id", "entry_idx").collect()
    assert len(rows) == 8  # garbage row skipped
    assert rows[0].loc == "https://h0.test/p0"
    assert rows[0].priority == 0.5


def test_cdx_records_spark(spark):
    from deltalake2db_spark.operators.warc import cdx_records

    lines = [
        ('test,ex)/a 20240101000000 {"url": "https://ex.test/a", '
         '"mime": "text/html", "status": "200", "digest": "AAA", '
         '"length": "1234", "offset": "0", '
         '"filename": "c.warc.gz"}',),
        ("test,ex)/b 20240101000001 {broken json",),
    ]
    df = spark.createDataFrame(lines, ["line"])
    out = {r.urlkey: r for r in cdx_records(df).collect()}
    a = out["test,ex)/a"]
    assert a.url == "https://ex.test/a" and a.status == 200
    assert a.warc_length == 1234 and a.warc_filename == "c.warc.gz"
    b = out["test,ex)/b"]
    assert b.url is None and b.status is None  # PERMISSIVE nulls
    assert b.fetch_ts == "20240101000001"
