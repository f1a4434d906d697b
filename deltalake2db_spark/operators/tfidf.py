"""Corpus term statistics: TF-IDF-style distinctive terms per group.

Training-data pipelines profile sources by their most *distinctive*
vocabulary (domain characterization, topic balance checks, spam-source
detection).  Classic TF-IDF weights term frequency by a log-inverse
document frequency; logs are engine-specific in their last bits, so to
keep the DuckDB oracle bit-exact this operator uses an integer IDF
surrogate: ``score = tf * (n_groups - df + 1)`` — monotone in the same
direction (rarer across groups => larger factor), exact BIGINT
arithmetic end-to-end.  Documented deviation from float TF-IDF.

Spark-first design
------------------
* One ``split`` per document, one explode, then an all-integer
  aggregation tree: ``(group, word) -> tf``, reused for
  ``word -> df`` (count of groups containing the word) — the second
  agg consumes the FIRST agg's output (tiny), never re-reads the
  corpus.
* ``n_groups`` is a one-row aggregate cross-joined in (broadcast) —
  no driver collect, the plan stays fully lazy/composable.
* Final top-k is a window over the (group, word) stats table —
  orders of magnitude smaller than the corpus; skew bounded by
  vocabulary size per group, not corpus size.
* At 100 TB the only corpus-sized shuffle is the (group, word)
  partial-combine aggregate, which map-side-collapses each task's
  words before the exchange.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def term_stats(
    df: DataFrame, text_col: str = "text", group_col: str = "source"
) -> DataFrame:
    """``(group, word, term_freq, doc_freq, score)`` for every word.

    ``doc_freq`` counts *groups* containing the word;
    ``score = term_freq * (n_groups - doc_freq + 1)`` (exact integers).
    """
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    toks = df.select(F.col(group_col).alias("group"), F.explode(words).alias("word"))
    tf = toks.groupBy("group", "word").agg(F.count(F.lit(1)).alias("term_freq"))
    dfreq = tf.groupBy("word").agg(F.count(F.lit(1)).alias("doc_freq"))
    ngroups = tf.select("group").distinct().agg(
        F.count(F.lit(1)).alias("__n_groups")
    )
    return (
        tf.join(dfreq, "word")
        .crossJoin(broadcast(ngroups))
        .withColumn(
            "score",
            F.col("term_freq")
            * (F.col("__n_groups") - F.col("doc_freq") + F.lit(1)),
        )
        .drop("__n_groups")
    )


def top_terms(
    df: DataFrame,
    text_col: str = "text",
    group_col: str = "source",
    k: int = 5,
) -> DataFrame:
    """Top-``k`` distinctive terms per group, deterministic tie-break
    (score desc, then word asc)."""
    stats = term_stats(df, text_col, group_col)
    w = Window.partitionBy("group").orderBy(
        F.col("score").desc(), F.col("word").asc()
    )
    return (
        stats.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select("group", "rank", "word", "term_freq", "doc_freq", "score")
    )
