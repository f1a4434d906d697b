"""Okapi BM25 top-k retrieval over a tokenized corpus.

Training-data pipelines use lexical retrieval for benchmark
decontamination (find the corpus documents most similar to each eval
question — the retrieval-based complement of the n-gram screens in
``contamination.py``), for quality mining (retrieve near the seed set),
and for building paired data.  BM25 (Robertson et al., TREC-3 — public
method) is the standard scoring function; this module implements
Lucene-flavored BM25 as pure DataFrame algebra.

Model definition (deterministic, engine-independent):

* tokens(d)  = ``split(trim(text), '\\s+')`` — the repo-wide convention
* tf(d, w)   = occurrences of ``w`` in d; dl(d) = len(tokens(d))
* N          = docs with non-NULL text; avgdl = mean dl
* df(w)      = docs containing w
* idf(w)     = ln(1 + (N − df + 0.5)/(df + 0.5))   (Lucene: ≥ 0)
* score(q,d) = Σ_{w ∈ distinct tokens(q)} idf(w) ·
               tf·(k1+1) / (tf + k1·(1 − b + b·dl/avgdl))
* top-k per query by (round(score, 6) DESC, doc id ASC) — ranking on
  the ROUNDED score so ordering is reproducible engine-to-engine
  (independent float summation orders agree to ~1e-12; the unrounded
  value would make near-ties an engine lottery).

Spark-first design
------------------
* The corpus is tokenized ONCE; ``tf`` is a (doc, word) partial-combine
  aggregate (the one corpus-sized shuffle) with dl carried through as
  ``max`` — no doc-keyed second pass.
* The QUERY side is small by construction (an eval set, a seed set):
  its distinct word set **broadcasts**, and the inner join prunes the
  posting table to the query vocabulary BEFORE anything else — df(w)
  is then a per-word COUNT AGGREGATE over the PRUNED postings (exact:
  pruning drops whole words, never a word's doc rows), partial-combined
  map-side over the reused tf exchange and broadcast back — it shuffles
  |query vocabulary| rows, never re-sorts the posting table (the
  count-window formulation it replaced did).  ReuseExchange only fires
  because every consumer references ALL of tf/dl/first through
  unprovable conjuncts (dsir's load-bearing-column pattern); without
  that, Catalyst column-prunes the consumers differently, the subtrees
  stop being identical, and the corpus is tokenized and tf-aggregated
  once per branch — the failure mode ``dsir.dsir_logweights``
  documents.
* The scoring shuffle aggregates only matched (query, doc) postings.
* N/avgdl ride in as a broadcast one-row aggregate over a pruned
  two-column scan; the plan stays lazy (no driver collect).
* Final top-k is a per-query window over the scored pairs — bounded by
  |queries| × matched docs, not the corpus.

Reference scope note: the reference engine (bmsuisse/deltalake2db) has
no text operators (SURVEY.md §2.5); this is a north-star extension for
LLM training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

TOKEN_SPLIT = "\\s+"


def bm25_topk(
    docs: DataFrame,
    queries: DataFrame,
    k: int = 10,
    k1: float = 1.2,
    b: float = 0.75,
    text_col: str = "text",
    id_col: str = "doc_id",
    query_text_col: str = "text",
    query_id_col: str = "query_id",
) -> DataFrame:
    """``(query_id, rank, doc_id, score)`` — top-``k`` BM25 hits per
    query, rank 1 = best, deterministic ``(score DESC, doc_id ASC)``
    order on the 6-decimal-rounded score.

    ``queries`` must be model-sized (it is broadcast); queries whose
    terms match nothing are absent from the result.
    """
    from .parallel import spread_scan

    docs = spread_scan(docs)  # tokenize must not run on one row group
    words = F.split(F.trim(F.col(text_col)), TOKEN_SPLIT)
    qwords = F.split(F.trim(F.col(query_text_col)), TOKEN_SPLIT)
    qterms = (
        queries.filter(F.col(query_text_col).isNotNull())
        .select(F.col(query_id_col), F.explode(qwords).alias("__ws"))
        .select(query_id_col, F.xxhash64("__ws").alias("__w"))
        .distinct()
    )
    # the query side is consumed TWICE (vocabulary prune + scoring
    # join); materialize it once into a LocalRelation when it fits the
    # model-size contract (bounded probe: limit N+1, 16-byte rows), so
    # neither broadcast re-evaluates the query subplan — when queries
    # derive from a corpus scan, that is two whole text scans saved.
    # Oversized query sets (contract violation) keep the lazy plan.
    _QMAX = 200_000
    probe = qterms.limit(_QMAX + 1).toArrow()
    if probe.num_rows <= _QMAX:
        qterms = queries.sparkSession.createDataFrame(probe)
    # posting keys are 64-bit word hashes, not strings: the tf shuffle,
    # the query join, and the df window all move/compare 8 bytes
    # (injective-in-practice at corpus vocabularies — the repo-wide
    # dedup argument; measured 2.33 -> 1.90 s on the sf0.1 gate with
    # byte-identical output).  posexplode tags each doc's FIRST token
    # (every non-NULL text has >= 1 split token, even ""), which lets
    # the N/avgdl corpus stats ride the SAME scan: the text column is
    # read once, not once for tf and again for stats (r11 — at corpus
    # scale the second full read of the text column dwarfed the one
    # extra row per doc this adds to the pruned shuffle).
    # The token ARRAY is materialized in its own projection BELOW the
    # posexplode: putting size(words) in the same select as the
    # generator lets the analyzer (ExtractGenerator) hoist it into the
    # Project ABOVE the Generate, where `size(split(text))` re-splits
    # the whole document ONCE PER TOKEN ROW — O(n²) regex work per doc
    # (measured: this subtree alone 2.5 s -> 0.27 s at sf0.1 with the
    # two-step select; guide §1.2/§4 — fix the per-task work).  With
    # __arr a real child column, the Generate explodes a column
    # reference and size(__arr) above it is O(1) numElements.
    toks = docs.filter(F.col(text_col).isNotNull()).select(
        F.col(id_col),
        words.alias("__arr"),
    ).select(
        id_col,
        F.size("__arr").alias("__dl"),
        F.posexplode("__arr").alias("__pos", "__ws"),
    ).select(
        id_col,
        "__dl",
        (F.col("__pos") == 0).alias("__f0"),
        F.xxhash64("__ws").alias("__w"),
    )
    # prune to the query vocabulary BELOW the tf aggregate (r10): the
    # broadcast hash join filters the raw TOKEN stream map-side, so
    # the one corpus exchange carries only query-matched tokens — at a
    # web-scale vocabulary that is the difference between shuffling
    # every (doc, term) pair and shuffling the handful the queries
    # name.  Per-(doc, term) tf is unaffected by dropping other terms,
    # so scores are byte-identical to pruning after the aggregate.
    # LEFT join + keep-first-token filter instead of inner join: each
    # doc's first token survives even when unmatched, carrying (dl)
    # for the stats branch.
    qmark = broadcast(
        qterms.select("__w").distinct().withColumn("__m", F.lit(True))
    )
    kept = toks.join(qmark, "__w", "left").filter(
        F.col("__m").isNotNull() | F.col("__f0")
    )
    pruned = kept.groupBy(id_col, "__w").agg(
        F.count("__m").alias("__tf"),  # matched occurrences only
        F.max("__dl").alias("__dl"),
        F.bool_or("__f0").alias("__first"),
    )
    # ALL THREE branches below consume ALL THREE aggregate values
    # (dsir's load-bearing-column pattern): the `__first.isNotNull()` /
    # `__tf >= 0` / `__dl >= 0` conjuncts are semantically always-true
    # but reference nullable/unprovable aggregate outputs, so Catalyst
    # cannot fold them away and column-prunes every branch IDENTICALLY
    # — which is what lets ReuseExchange share the one tokenize+shuffle
    # between scoring, document frequency, and the stats broadcast
    # (without them the subtrees diverge and the corpus scans thrice;
    # observed in the plan).
    postings = pruned.filter(
        (F.col("__tf") > 0) & F.col("__first").isNotNull()
    )
    # df(w) as a tiny per-word aggregate broadcast back, NOT a
    # count-window over the postings (r12): the window formulation
    # re-exchanged and SORTED the whole posting table on __w just to
    # attach one count; this aggregate partial-combines map-side over
    # the ReusedExchange output, shuffles only |query vocabulary| rows
    # (bounded by the model-size contract), and joins back as a
    # broadcast.  Exact by the same pruning argument as tf: the prune
    # drops whole words, never a word's doc rows.
    dfreq = postings.groupBy("__w").agg(
        F.count(F.when(F.col("__dl") >= 0, True)).alias("__df")
    )
    corpus = pruned.filter(
        F.col("__first") & (F.col("__tf") >= 0)
    ).agg(
        F.count(F.lit(1)).alias("__n"),
        F.avg("__dl").alias("__avgdl"),
    )
    idf = F.log(
        F.lit(1.0)
        + (F.col("__n") - F.col("__df") + F.lit(0.5))
        / (F.col("__df") + F.lit(0.5))
    )
    norm = F.col("__tf") * F.lit(k1 + 1.0) / (
        F.col("__tf")
        + F.lit(k1)
        * (F.lit(1.0 - b) + F.lit(b) * F.col("__dl") / F.col("__avgdl"))
    )
    scored = (
        postings.join(broadcast(dfreq), "__w")
        .join(broadcast(qterms), "__w")
        .crossJoin(broadcast(corpus))
        .groupBy(query_id_col, id_col)
        .agg(F.round(F.sum(idf * norm), 6).alias("score"))
    )
    wq = Window.partitionBy(query_id_col).orderBy(
        F.col("score").desc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(wq))
        .filter(F.col("rank") <= k)
        .select(query_id_col, "rank", id_col, "score")
    )
