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
  aggregation tree: ``(group, word) -> tf``; ``doc_freq`` (count of
  groups containing the word) is a count WINDOW over the tf table —
  one word-keyed exchange of the vocabulary-sized stats, no self-join,
  never re-reads the corpus.
* ``n_groups`` is a one-row aggregate over a two-column pruned scan,
  cross-joined in (broadcast) — no driver collect, the plan stays
  fully lazy/composable.
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
    from .parallel import spread_scan

    words = F.split(F.trim(F.col(text_col)), "\\s+")
    toks = spread_scan(df).select(
        F.col(group_col).alias("group"), F.explode(words).alias("word")
    )
    tf = toks.groupBy("group", "word").agg(F.count(F.lit(1)).alias("term_freq"))
    # doc_freq as a count window over the vocabulary-sized tf table —
    # the former dfreq aggregate + equi-join re-shuffled tf twice for
    # the same word-keyed distribution the window gets in one exchange
    wv = Window.partitionBy("word")
    stats = tf.withColumn("doc_freq", F.count(F.lit(1)).over(wv))
    # n_groups = groups with >= 1 token.  Any non-NULL text tokenizes
    # to >= 1 word (split of '' is ['']), so this equals
    # count(DISTINCT group) over non-NULL-text rows — computable from a
    # two-column pruned scan instead of re-deriving the whole
    # explode+aggregate tf subtree a second time (lazy plans re-run it;
    # that was a hidden full corpus pass)
    ngroups = (
        df.filter(F.col(text_col).isNotNull())
        .select(F.col(group_col).alias("group"))
        .distinct()
        .agg(F.count(F.lit(1)).alias("__n_groups"))
    )
    return (
        stats.crossJoin(broadcast(ngroups))
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
