"""HTML -> clean training text: tag strip + boilerplate removal.

The missing middle of the WARC pipeline: ``warc.warc_records`` yields
``text/html`` bodies, and everything downstream (dedup, quality,
lang-id, tokenize) wants plain prose — this module turns one into the
other with a CCNet/trafilatura-STYLE block heuristic, stdlib only:

1. strip ``<!-- -->`` comments and whole ``<script>/<style>/
   <noscript>/<template>/<svg>/<iframe>`` subtrees;
2. capture ``<title>``, then drop the ``<head>`` subtree;
3. split the body at BLOCK-LEVEL tags (``p div h1-6 li table ...``)
   into candidate blocks;
4. per block: visible text = inline tags stripped (tag -> one space),
   entities decoded (``html.unescape``), whitespace (incl. NBSP)
   collapsed; link text = the same over ``<a>...</a>`` spans only;
5. keep blocks with ``len(text) >= min_block_chars`` (kills nav
   items, button labels, copyright lines) AND ``link_density =
   len(link_text)/len(text) <= max_link_density`` (kills menus,
   footers, related-link boxes — the classic boilerplate signature);
6. document text = kept blocks joined with newlines.

Deterministic by construction (regex + stdlib ``html.unescape``, no
heuristic randomness), so gates can replay the full law in SQL.

Spark tier: ``extract_html`` / ``warc_html_texts`` are map-side
``mapInPandas`` — at 100 TB the parse is embarrassingly parallel
inside the scan, no shuffle, no driver involvement; only the clean
text leaves the stage.

Reference scope: the reference engine (bmsuisse/deltalake2db) has no
text/ingestion tier (SURVEY.md §2.5); north-star extension for LLM
training-data pipelines.
"""

from __future__ import annotations

import re
from html import unescape
from typing import Iterator, Optional

import pandas as pd
from pyspark.sql import DataFrame

_BLOCK_TAGS = (
    "p|div|h[1-6]|li|ul|ol|br|hr|tr|td|th|table|thead|tbody|tfoot|"
    "article|section|header|footer|nav|blockquote|pre|dd|dt|dl|"
    "figure|figcaption|main|aside|form|address|summary|details|"
    "fieldset|legend|option|select|textarea|caption"
)
_RE_COMMENT = re.compile(r"<!--.*?-->", re.S)
_RE_DROP = re.compile(
    r"<(script|style|noscript|template|svg|iframe)\b[^>]*>.*?"
    r"</\1\s*>",
    re.S | re.I,
)
_RE_HEAD = re.compile(r"<head\b[^>]*>.*?</head\s*>", re.S | re.I)
_RE_TITLE = re.compile(r"<title\b[^>]*>(.*?)</title\s*>", re.S | re.I)
_RE_BLOCK = re.compile(rf"</?(?:{_BLOCK_TAGS})\b[^>]*/?>", re.I)
_RE_A = re.compile(r"<a\b[^>]*>(.*?)</a\s*>", re.S | re.I)
_RE_TAG = re.compile(r"<[^>]*>")
_RE_WS = re.compile("[\\s\u00a0]+")


def _norm(s: str) -> str:
    """Entity decode then collapse ALL whitespace (incl. the NBSP an
    entity may have produced) to single spaces.  Decode AFTER tag
    stripping, so ``&lt;p&gt;`` in content can never re-form a tag."""
    return _RE_WS.sub(" ", unescape(s)).strip()


def extract_text(
    html: Optional[str],
    min_block_chars: int = 30,
    max_link_density: float = 0.33,
) -> Optional[dict]:
    """One document: ``{title, text, n_blocks, n_blocks_total}``.
    ``text`` is kept blocks joined with ``\\n`` ('' when nothing
    survives); ``n_blocks_total`` counts every block with ANY visible
    text, kept or not.  None input -> None."""
    if html is None:
        return None
    h = _RE_COMMENT.sub(" ", html)
    h = _RE_DROP.sub(" ", h)
    tm = _RE_TITLE.search(h)
    title = _norm(_RE_TAG.sub(" ", tm.group(1))) if tm else None
    h = _RE_HEAD.sub(" ", h)
    kept = []
    total = 0
    for seg in _RE_BLOCK.sub("\n", h).split("\n"):
        txt = _norm(_RE_TAG.sub(" ", seg))
        if not txt:
            continue
        total += 1
        link_chars = sum(len(_norm(m)) for m in _RE_A.findall(seg))
        density = min(link_chars / len(txt), 1.0)
        if len(txt) >= min_block_chars and density <= max_link_density:
            kept.append(txt)
    return {
        "title": title or None,
        "text": "\n".join(kept),
        "n_blocks": len(kept),
        "n_blocks_total": total,
    }


# ------------------------------------------------------------ Spark tier


def extract_html(
    df: DataFrame,
    html_col: str = "html",
    id_col: str = "doc_id",
    min_block_chars: int = 30,
    max_link_density: float = 0.33,
) -> DataFrame:
    """``(id_col, title, text, n_blocks, n_blocks_total)`` — map-side
    main-content extraction over an HTML string column.  Rows with
    NULL html are dropped (nothing to extract)."""
    out_schema = (
        f"{id_col} long, title string, text string, "
        "n_blocks int, n_blocks_total int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for did, h in zip(pdf[id_col], pdf[html_col]):
                r = extract_text(
                    None if h is None else str(h),
                    min_block_chars=min_block_chars,
                    max_link_density=max_link_density,
                )
                if r is None:
                    continue
                rows.append((
                    int(did), r["title"], r["text"],
                    r["n_blocks"], r["n_blocks_total"],
                ))
            yield pd.DataFrame(
                rows,
                columns=[id_col, "title", "text", "n_blocks",
                         "n_blocks_total"],
            )

    from .parallel import kernel_map

    return kernel_map(df, batches, out_schema, cols=(id_col, html_col))


def warc_html_texts(
    media: DataFrame,
    min_block_chars: int = 30,
    max_link_density: float = 0.33,
) -> DataFrame:
    """WARC payload table -> one row of CLEAN TEXT per crawled HTML
    page: ``(media_id, record_idx, url, warc_date, title, text,
    n_blocks, n_blocks_total)`` — the WARC -> training-text path,
    ``warc.warc_records`` composed with the block extractor.  Both
    stages are map-side; the raw HTML never leaves the executor."""
    from .warc import warc_records

    recs = warc_records(media, text_only=True)
    out_schema = (
        "media_id long, record_idx int, url string, warc_date string, "
        "title string, text string, n_blocks int, n_blocks_total int"
    )

    def batches(it: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in it:
            rows = []
            for mid, ridx, url, wdate, ctype, body in zip(
                pdf["media_id"], pdf["record_idx"], pdf["url"],
                pdf["warc_date"], pdf["content_type"], pdf["text"],
            ):
                if not str(ctype).split(";")[0].strip().endswith("html"):
                    continue
                r = extract_text(
                    None if body is None else str(body),
                    min_block_chars=min_block_chars,
                    max_link_density=max_link_density,
                )
                if r is None:
                    continue
                rows.append((
                    int(mid), int(ridx), url, wdate, r["title"],
                    r["text"], r["n_blocks"], r["n_blocks_total"],
                ))
            yield pd.DataFrame(
                rows,
                columns=["media_id", "record_idx", "url", "warc_date",
                         "title", "text", "n_blocks",
                         "n_blocks_total"],
            )

    from .parallel import kernel_map

    return kernel_map(recs, batches, out_schema)
