"""URL operations — the crawl-curation filter stage, pure Catalyst.

Between WARC ingestion (``operators/warc.py``) and the text operators
sits URL-level curation: C4/CCNet-style pipelines normalize URLs,
key dedup on them, group quality decisions by site, and screen
domains against blocklists.  Everything here is built-in-function
Column algebra (regexp + string ops — JVM-side, whole-stage codegen,
zero Python), so the filters run at scan speed on billions of rows.

* ``url_parts(col)``: struct(scheme, host, port, path, query) via one
  anchored regexp.
* ``normalize_url(col)``: lowercase scheme/host, default ports and
  fragments stripped, empty path -> '/', trailing '?' dropped — the
  dedup key a crawler uses.
* ``url_domain(col)`` / ``url_site(col)``: full host, and the
  approximate registrable domain (last two labels, or last three when
  the TLD is a 2-letter country code with a common second-level label
  — documented approximation: the full public-suffix list is a data
  file, not an algorithm; swap in a broadcast PSL table where
  exactness matters).
* ``filter_urls(df, ...)``: allow/block domain screens + scheme
  whitelist, suffix-anchored so ``evil-example.com`` does NOT match a
  blocked ``example.com``.

Reference scope: no ingestion tier in the reference engine
(SURVEY.md §2.5); north-star extension.
"""

from __future__ import annotations

from typing import Optional, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

_URL_RE = r"^([a-zA-Z][a-zA-Z0-9+.-]*)://([^/:?#]*)(?::(\d+))?([^?#]*)\??([^#]*)"

_CC_SLD = "(?:com|co|org|net|gov|ac|edu)"


def url_parts(col) -> Column:
    """struct(scheme, host, port, path, query) — one regexp pass."""
    c = F.col(col) if isinstance(col, str) else col
    return F.struct(
        F.lower(F.regexp_extract(c, _URL_RE, 1)).alias("scheme"),
        F.lower(F.regexp_extract(c, _URL_RE, 2)).alias("host"),
        F.nullif(F.regexp_extract(c, _URL_RE, 3), F.lit("")).cast(
            "int"
        ).alias("port"),
        F.regexp_extract(c, _URL_RE, 4).alias("path"),
        F.nullif(F.regexp_extract(c, _URL_RE, 5), F.lit("")).alias(
            "query"
        ),
    )


def normalize_url(col) -> Column:
    """Canonical URL string: lowercased scheme+host, default port
    (80/443) and fragment stripped, empty path -> '/', dangling '?'
    dropped.  NULL for strings that don't parse as absolute URLs."""
    p = url_parts(col)
    default_port = (
        (p.scheme.eqNullSafe(F.lit("http")) & (p.port == 80))
        | (p.scheme.eqNullSafe(F.lit("https")) & (p.port == 443))
    )
    port_part = F.when(
        p.port.isNotNull() & ~default_port,
        F.concat(F.lit(":"), p.port.cast("string")),
    ).otherwise(F.lit(""))
    path_part = F.when(p.path == "", F.lit("/")).otherwise(p.path)
    query_part = F.when(
        p.query.isNotNull(), F.concat(F.lit("?"), p.query)
    ).otherwise(F.lit(""))
    out = F.concat(
        p.scheme, F.lit("://"), p.host, port_part, path_part, query_part
    )
    return F.when(p.scheme != "", out)


def url_domain(col) -> Column:
    """The full lowercased host."""
    return url_parts(col).host


def url_site(col) -> Column:
    """Approximate registrable domain (eTLD+1): the last two host
    labels, or the last three when the TLD is a 2-letter ccTLD and
    the second-level label is a common registry label (com/co/org/
    net/gov/ac/edu) — e.g. ``news.bbc.co.uk -> bbc.co.uk`` but
    ``a.b.example.com -> example.com``.  IPs pass through whole."""
    host = url_domain(col)
    is_ip = host.rlike(r"^\d{1,3}(\.\d{1,3}){3}$")
    cc3 = F.regexp_extract(
        host, r"([^.]+\." + _CC_SLD + r"\.[a-z]{2})$", 1
    )
    two = F.regexp_extract(host, r"([^.]+\.[^.]+)$", 1)
    return F.when(is_ip, host).otherwise(
        F.when(cc3 != "", cc3).otherwise(F.when(two != "", two).otherwise(host))
    )


def filter_urls(
    df: DataFrame,
    url_col: str = "url",
    allowed_schemes: Sequence[str] = ("http", "https"),
    block_domains: Optional[Sequence[str]] = None,
    allow_domains: Optional[Sequence[str]] = None,
) -> DataFrame:
    """Screen rows by URL: scheme whitelist, then domain blocklist
    (suffix-anchored on label boundaries: blocking ``example.com``
    drops ``a.example.com`` but NOT ``evil-example.com``), then an
    optional domain allowlist.  Pure Column predicates — the corpus
    never shuffles and the screen pushes into the scan."""
    p = url_parts(url_col)
    keep = p.scheme.isin(*[s.lower() for s in allowed_schemes])
    host = p.host

    def _matches(domains):
        cond = F.lit(False)
        for d in sorted({d.lower().lstrip(".") for d in domains}):
            cond = cond | (host == d) | host.endswith("." + d)
        return cond

    if block_domains:
        keep = keep & ~_matches(block_domains)
    if allow_domains:
        keep = keep & _matches(allow_domains)
    return df.filter(keep)
