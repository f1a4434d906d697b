"""Benchmark-contamination detection: word n-gram overlap.

Training corpora must be screened against evaluation benchmarks —
a document sharing long verbatim n-grams with a benchmark item leaks
test data into training.  The standard check (GPT-3 appendix C,
PaLM/Llama data cards) flags documents whose word n-grams collide with
any benchmark n-gram.

Spark-first design
------------------
* n-grams are built **inside codegen**: ``split`` once, then
  ``transform(sequence(...))`` slices — no Python, no explode until the
  join needs rows.
* The overlap is an **equi-join on the gram**, i.e. an inverted-index
  probe — never a doc × benchmark cross product.  At 100 TB the corpus
  side shuffles only ``(doc_id, gram)`` pairs; the benchmark side is
  tiny (thousands of items) and **broadcast**, so the corpus never
  shuffles at all in the common case.
* Counts are distinct-gram counts, so repeated boilerplate inside one
  document doesn't inflate the contamination score.

At crawl scale you'd join on ``xxhash64(gram)`` to shuffle 8 bytes
instead of strings; we join on the gram itself so the DuckDB oracle is
exact (hashing is an internal optimization that must not change
results — collisions, however unlikely, would).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def word_ngrams(df: DataFrame, text_col: str, n: int, out: str = "gram"):
    """Explode whitespace word ``n``-grams of ``text_col``.

    ``split`` runs once per row; gram assembly is ``array_join(slice)``
    over a ``sequence`` — all built-in, whole-stage codegen.
    Documents shorter than ``n`` words produce no grams.
    """
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    # sequence(1, 0) descends in Spark — short docs need the empty branch
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.withColumn(out, F.explode(grams))


def word_ngram_hashes(text_col, n: int):
    """Array of 64-bit word-n-gram hashes — same tokenization as
    ``word_ngrams`` (trim + ``\\s+`` split, NO lowercasing) but each
    word is xxhash64'd once and n consecutive word hashes fold with
    rotate-xor instead of materializing gram strings (the same
    arithmetic scheme as ``dedup.shingle_hash_array``; collision-free
    in practice at 64 bits, and token boundaries are unambiguous
    because the fold runs over the word-hash sequence)."""
    rotl = lambda c, k: F.shiftleft(c, k).bitwiseOR(  # noqa: E731
        F.shiftrightunsigned(c, 64 - k)
    )
    words = F.split(F.trim(text_col), "\\s+")
    wh = F.transform(words, lambda w: F.xxhash64(w))
    acc = wh
    for i in range(1, n):
        rest = F.slice(wh, i + 1, F.greatest(F.size(wh) - i, F.lit(0)))
        acc = F.zip_with(acc, rest, lambda a, b: rotl(a, 13).bitwiseXOR(b))
    if n > 1:
        acc = F.filter(acc, lambda x: x.isNotNull())
    return acc


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Per-document contamination report against a benchmark set.

    Returns ``(doc_id, n_grams, n_matched, contaminated)`` where
    ``n_grams`` counts the document's distinct n-grams, ``n_matched``
    how many of those appear anywhere in the benchmark, and
    ``contaminated`` is ``n_matched >= min_hits``.

    Plan shape: grams are 64-bit HASHES (8 bytes moved per gram, never
    gram strings), built by the codegen window fold; so the corpus-side
    pipeline is scan → posexplode → ONE doc_id exchange (window fold) →
    broadcast-left-join against the benchmark's distinct gram hashes →
    two doc-keyed hash aggregates that both REUSE the window's
    distribution.  One corpus shuffle total, keyed by doc_id — uniform,
    skew-free.
    """
    # gram hashes come from the codegen shingle path (posexplode +
    # lead-window fold — dedup.shingled, same values as
    # word_ngram_hashes whose transform/zip_with lambdas evaluate
    # interpreted).  Its doc-keyed window exchange doubles as the
    # parallelism spreader for single-file corpora — and it is the
    # ONLY corpus exchange in the plan.
    from .dedup import shingled

    doc_grams = shingled(
        docs, doc_id, text_col, n, lower=False
    ).withColumnRenamed("sh", "__gh")
    # the benchmark side is small by contract (it is broadcast below),
    # so its grams come from the ZERO-SHUFFLE fold — the window path's
    # exchange + distinct would cost two extra stages inside the
    # broadcast-build job for no parallelism gain (r7 bench: the
    # broadcast subtree was most of the 0.9 s above floor)
    bench_grams = (
        benchmark.select(
            F.explode(word_ngram_hashes(F.col(bench_text_col), n)).alias(
                "__gh"
            )
        )
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    flagged = doc_grams.join(broadcast(bench_grams), "__gh", "left")
    # per-(doc, gram) dedup then per-doc counts: BOTH groupBys are
    # satisfied by the window's hash(doc_id) distribution (doc_id is a
    # subset of the first key), so neither re-shuffles — and both are
    # whole-stage-codegen HashAggregates, where the previous
    # collect_set pair ran as a single-phase ObjectHashAggregate
    # building per-doc in-memory sets (measured: the slow half of the
    # gate at sf0.1).
    return (
        flagged.groupBy(doc_id, "__gh")
        .agg(F.max("__hit").alias("__h"))
        .groupBy(doc_id)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.count("__h").cast("int").alias("n_matched"),
        )
        .withColumn("contaminated", F.col("n_matched") >= F.lit(min_hits))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
) -> DataFrame:
    """Drop contaminated documents (the filtering counterpart).

    Anti-join on the flagged id set — the corpus body is touched once;
    at scale the flagged set is small and broadcast.
    """
    flagged = (
        contamination_check(
            docs, benchmark, n, doc_id, text_col, bench_text_col, min_hits
        )
        .filter(F.col("contaminated"))
        .select(doc_id)
    )
    return docs.join(broadcast(flagged), doc_id, "left_anti")
