"""Markdown → clean text — pure-Catalyst regexp algebra.

The code-corpus counterpart of ``operators/html.py``: READMEs, docs
folders, and issue bodies are markdown, and a pretraining pipeline
flattens them to prose before quality screens and dedup.  The whole
extraction is a chained ``regexp_replace`` / array pipeline of
built-in functions (JVM-side, whole-stage codegen, zero Python), so
it runs at scan speed — the same design discipline as ``urls.py`` and
``code.py``.

Law (deterministic, oracle-replayable):

1. fenced code blocks ````` … `````
   are DROPPED (or kept verbatim with ``keep_code=True``) — fences
   are where secrets/decoys live, the html gate's ``<script>`` move;
2. images ``![alt](url)`` keep the alt text, links ``[text](url)``
   and reference links ``[text][id]`` keep the text;
3. inline code backticks, emphasis (``**``/``*``/``__``/``_`` on
   word boundaries), heading markers, blockquote markers, list
   bullets/numbers, and horizontal rules are stripped;
4. raw HTML tags are removed;
5. lines are trimmed, blank lines dropped, and the survivors joined
   with a single newline.

Reference scope: no document-ingestion tier in the reference
(SURVEY.md §2.5); north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _col(c) -> Column:
    return F.col(c) if isinstance(c, str) else c


def markdown_to_text(col, keep_code: bool = False) -> Column:
    """Flatten markdown to prose (see module law)."""
    c = F.regexp_replace(_col(col), "\r\n?", "\n")
    if keep_code:
        # keep the fence BODY, drop the fence markers + info string
        c = F.regexp_replace(
            c, r"(?s)```[^\n]*\n(.*?)```", r"$1"
        )
    else:
        c = F.regexp_replace(c, r"(?s)```.*?```", "")
    # images before links (same bracket shape, extra '!')
    c = F.regexp_replace(c, r"!\[([^\]]*)\]\([^)]*\)", r"$1")
    c = F.regexp_replace(c, r"\[([^\]]+)\]\([^)]*\)", r"$1")
    c = F.regexp_replace(c, r"\[([^\]]+)\]\[[^\]]*\]", r"$1")
    c = F.regexp_replace(c, r"`([^`]*)`", r"$1")
    c = F.regexp_replace(c, r"\*\*([^*]+)\*\*", r"$1")
    c = F.regexp_replace(c, r"\*([^*]+)\*", r"$1")
    c = F.regexp_replace(c, r"\b__([^_]+)__\b", r"$1")
    c = F.regexp_replace(c, r"\b_([^_]+)_\b", r"$1")
    c = F.regexp_replace(c, r"(?m)^#{1,6}[ \t]+", "")
    c = F.regexp_replace(c, r"(?m)^>[ \t]?", "")
    c = F.regexp_replace(c, r"(?m)^[ \t]*[-*+][ \t]+", "")
    c = F.regexp_replace(c, r"(?m)^[ \t]*\d+\.[ \t]+", "")
    c = F.regexp_replace(c, r"(?m)^[ \t]*([-=_*])\1{2,}[ \t]*$", "")
    c = F.regexp_replace(c, r"<[^>\n]+>", "")
    lines = F.filter(
        F.transform(F.split(c, "\n", -1), lambda x: F.trim(x)),
        lambda x: x != "",
    )
    return F.array_join(lines, "\n")


def extract_markdown(
    df: DataFrame,
    md_col: str = "text",
    keep_code: bool = False,
    out_col: str = "text",
) -> DataFrame:
    """Replace/attach the flattened text plus ``n_md_lines`` — the
    DataFrame-level convenience wrapper (pure projection: no shuffle,
    composes with ``archive_members``/``warc_records`` upstream and
    the quality screens downstream)."""
    txt = markdown_to_text(md_col, keep_code=keep_code)
    out = df.withColumn(out_col, txt)
    return out.withColumn(
        "n_md_lines",
        F.when(
            F.col(out_col) == "", F.lit(0)
        ).otherwise(F.size(F.split(F.col(out_col), "\n", -1))),
    )
