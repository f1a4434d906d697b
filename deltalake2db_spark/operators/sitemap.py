"""Sitemap XML — urlset / sitemapindex parsing, map-side.

Completes the crawl-discovery loop: ``robots.py`` surfaces the
``Sitemap:`` pointers, this module parses the documents they point
at — ``<urlset>`` leaves (loc / lastmod / changefreq / priority) and
``<sitemapindex>`` internal nodes (nested sitemap locs) — into rows
that feed straight into ``urls.py`` screening.

Parsing is stdlib ``xml.etree`` (namespace-agnostic localname match,
no DTD/entity resolution — ElementTree does not expand external
entities, and a size cap bounds the biggest legal sitemap at 50 MB
per the protocol).  Gzip payloads (sitemap.xml.gz) inflate first.
Execution is ``mapInPandas`` — payload bytes never cross a shuffle.

Reference scope: no ingestion tier in the reference (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

import gzip
import zlib
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_MAX_BYTES = 50 << 20   # the sitemap protocol's own limit
_MAX_ENTRIES = 50_000   # likewise


def _local(tag: str) -> str:
    return tag.rsplit("}", 1)[-1].lower()


def parse_sitemap(payload) -> Optional[dict]:
    """Parse sitemap bytes/str: ``{kind: 'urlset'|'sitemapindex',
    entries: [{loc, lastmod, changefreq, priority}]}`` (index entries
    carry loc/lastmod only).  Returns None on non-sitemap or
    malformed input — the tier's fail-to-None contract."""
    import xml.etree.ElementTree as ET

    if payload is None:
        return None
    if isinstance(payload, str):
        data = payload.encode("utf-8", "replace")
    else:
        data = bytes(payload)
    if data[:2] == b"\x1f\x8b":
        try:
            data = gzip.decompress(data)
        except (OSError, EOFError, ValueError, zlib.error):
            return None
    if len(data) > _MAX_BYTES:
        return None
    try:
        root = ET.fromstring(data)
    except ET.ParseError:
        return None
    kind = _local(root.tag)
    if kind not in ("urlset", "sitemapindex"):
        return None
    child_tag = "url" if kind == "urlset" else "sitemap"
    entries = []
    for node in root:
        if _local(node.tag) != child_tag:
            continue
        if len(entries) >= _MAX_ENTRIES:
            break
        entry = {"loc": None, "lastmod": None, "changefreq": None,
                 "priority": None}
        for field in node:
            name = _local(field.tag)
            if name in entry and field.text is not None:
                entry[name] = field.text.strip()
        if entry["loc"]:
            entries.append(entry)
    return {"kind": kind, "entries": entries}


def sitemap_entries(
    df: DataFrame,
    payload_col: str = "payload",
    id_col: str = "media_id",
) -> DataFrame:
    """(id, kind, entry_idx, loc, lastmod, changefreq, priority) —
    one row per sitemap entry, parsed map-side; unparseable payloads
    skip fail-open.  ``kind='sitemapindex'`` rows are pointers to
    further sitemaps (feed them back through the fetch loop)."""
    out_schema = (
        f"{id_col} long, kind string, entry_idx int, loc string, "
        "lastmod string, changefreq string, priority double"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for rid, payload in zip(pdf[id_col], pdf[payload_col]):
                parsed = parse_sitemap(payload)
                if parsed is None:
                    continue
                for j, en in enumerate(parsed["entries"]):
                    try:
                        prio = (
                            float(en["priority"])
                            if en["priority"] is not None
                            else None
                        )
                    except ValueError:
                        prio = None
                    rows.append((
                        int(rid), parsed["kind"], j, en["loc"],
                        en["lastmod"], en["changefreq"], prio,
                    ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "kind", "entry_idx", "loc",
                         "lastmod", "changefreq", "priority"],
            )

    from .parallel import kernel_map

    return kernel_map(df, batches, out_schema, cols=(id_col, payload_col))


def encode_sitemap(
    entries: list, kind: str = "urlset", gz: bool = False
) -> bytes:
    """Fixture writer: ``entries`` is a list of dicts with ``loc``
    (+ optional lastmod/changefreq/priority)."""
    child = "url" if kind == "urlset" else "sitemap"
    parts = [
        '<?xml version="1.0" encoding="UTF-8"?>',
        f'<{kind} xmlns="http://www.sitemaps.org/schemas/sitemap/0.9">',
    ]
    for en in entries:
        parts.append(f"<{child}>")
        for name in ("loc", "lastmod", "changefreq", "priority"):
            v = en.get(name)
            if v is not None:
                parts.append(f"<{name}>{v}</{name}>")
        parts.append(f"</{child}>")
    parts.append(f"</{kind}>")
    out = "\n".join(parts).encode()
    return gzip.compress(out, 6) if gz else out
