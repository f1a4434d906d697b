"""Repetition-based document quality rules (Gopher-style).

Large-scale corpus curation filters documents whose content is
dominated by repetition — boilerplate, keyword stuffing, templated
spam.  The published rule set (Gopher, Rae et al. 2021, table A1;
reused by MassiveText / RefinedWeb / Dolma) thresholds per-document
repetition ratios:

* fraction of duplicate word occurrences,
* fraction of occurrences of the single most common word / n-gram,
* fraction of n-gram occurrences whose gram appears more than once.

Spark-first design
------------------
One ``split`` per document, gram assembly inside codegen
(``transform(sequence(...))`` — shared with
``contamination.word_ngrams``), then ONE explode into a
``(doc_id, gram_order, gram)`` stream covering every requested n at
once.  Counting is a two-level aggregate: ``(doc_id, n, gram)`` then
``(doc_id)`` — both shuffles are keyed by doc_id(+gram), so partial
map-side combine collapses each document's grams before anything
crosses the network, and skew is bounded by the largest single
document, not the corpus.  No Python in the pipeline, no per-doc
higher-order aggregates (interpreted per element), no N² anything.

Ratios are IEEE-double divisions of exact BIGINT counts rounded to 6
decimals — bit-identical between Spark and the DuckDB oracle.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _gram_array(words, n: int):
    """Word n-gram array from a pre-split word array (codegen-only)."""
    if n == 1:
        return words
    return F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))


def repetition_metrics(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ns: tuple = (1, 2, 3),
) -> DataFrame:
    """Per-document repetition ratios for each requested n-gram order.

    Returns one row per document with, for every ``n`` in ``ns``:

    * ``top{n}_frac`` — occurrences of the most frequent n-gram over
      total n-gram occurrences,
    * ``dup{n}_frac`` — occurrences belonging to grams seen >= 2 times
      over total occurrences.

    Documents shorter than ``n`` words get NULL for that order (no
    grams to measure) — same semantics in the oracle.
    """
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    stacked = df.select(
        F.col(id_col),
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(n).alias("n"), _gram_array(words, n).alias("grams")
                    )
                    for n in ns
                ]
            )
        ).alias("g"),
    ).select(id_col, F.col("g.n").alias("n"), F.explode("g.grams").alias("gram"))

    counts = stacked.groupBy(id_col, "n", "gram").agg(
        F.count(F.lit(1)).alias("c")
    )
    per_n = counts.groupBy(id_col, "n").agg(
        F.sum("c").alias("total"),
        F.max("c").alias("top"),
        F.coalesce(F.sum(F.when(F.col("c") >= 2, F.col("c"))), F.lit(0)).alias(
            "dup"
        ),
    )
    aggs = []
    for n in ns:
        hit = F.when(F.col("n") == n, F.col("top") / F.col("total"))
        aggs.append(F.round(F.max(hit), 6).alias(f"top{n}_frac"))
        hit = F.when(F.col("n") == n, F.col("dup") / F.col("total"))
        aggs.append(F.round(F.max(hit), 6).alias(f"dup{n}_frac"))
    return per_n.groupBy(id_col).agg(*aggs)


def quality_flags(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    max_top2_frac: float = 0.20,
    max_dup3_frac: float = 0.60,
) -> DataFrame:
    """Gopher-style pass/fail flag from the repetition metrics.

    Thresholds follow the published ones loosely (the exact numbers are
    corpus-tuned); a NULL metric (doc too short for the order) counts
    as passing, matching the reference rule sets which skip
    inapplicable rules.
    """
    m = repetition_metrics(df, text_col, id_col, ns=(2, 3))
    keep = (
        F.coalesce(F.col("top2_frac") <= max_top2_frac, F.lit(True))
        & F.coalesce(F.col("dup3_frac") <= max_dup3_frac, F.lit(True))
    )
    return m.withColumn("keep", keep)
