"""Streaming deduplication — exact and near-dup over micro-batches.

The continuous-ingestion shape a training-data pipeline runs: crawl
increments land in a Delta table, the Structured Streaming source
(``delta_stream_source``) drains new commits, and each micro-batch is
deduplicated twice before it may join the corpus:

1. **Exact, cross-batch, bounded state** — ``dropDuplicates`` /
   ``dropDuplicatesWithinWatermark`` over an 8-byte fingerprint column,
   so the state store holds one long per distinct document ever seen
   (watermarked: per document inside the lateness horizon), never the
   document bytes.
2. **Near-dup against the already-ingested corpus** — bipartite
   MinHash-LSH (``operators.dedup.dedup_against``) inside
   ``foreachBatch``; survivors are appended to the corpus table, so
   batch N+1 dedups against everything batch N admitted.  The reference
   side is re-scanned per batch from the Delta log (cheap: metadata is
   driver-side, data files are only read by the band join), which is
   what makes the loop incremental rather than a periodic full-corpus
   self-join — at 100 TB the self-join is the thing you can never
   afford to re-run.

No row-at-a-time Python: the fingerprint is ``xxhash64`` (codegen), and
the foreachBatch body is the same banded/bucket-capped batch operators
the offline path uses.

Extension surface: the reference (bmsuisse/deltalake2db) has no
streaming at all; this composes its Delta-log machinery with Spark
Structured Streaming.
"""

from __future__ import annotations

from typing import Callable, Optional, Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

_FP = "__dl2db_fp"


def fingerprint_dedup_stream(
    stream: DataFrame,
    key_cols: Sequence[str] = ("text",),
    time_col: Optional[str] = None,
    delay: str = "10 minutes",
) -> DataFrame:
    """Exact cross-batch dedup of a streaming DataFrame.

    Keeps the first arrival of every distinct ``key_cols`` combination.
    With ``time_col`` the state is *bounded*: a watermark of ``delay``
    lets the store evict fingerprints older than the lateness horizon
    (``dropDuplicatesWithinWatermark``); without it the state grows one
    8-byte key per distinct document for the stream's lifetime — fine
    for bounded replays, ruinous for an unbounded 100 TB crawl, hence
    the watermarked form is the production default.
    """
    df = stream.withColumn(_FP, F.xxhash64(*[F.col(c) for c in key_cols]))
    if time_col is not None:
        df = df.withWatermark(time_col, delay).dropDuplicatesWithinWatermark([_FP])
    else:
        df = df.dropDuplicates([_FP])
    return df.drop(_FP)


def neardup_ingest_batch(
    corpus_path: str,
    id_col: str = "doc_id",
    text_col: str = "text",
    intra_batch: bool = True,
    app_id: str = "dl2db-neardup-ingest",
    **lsh_kwargs,
) -> Callable[[DataFrame, int], None]:
    """Build a ``foreachBatch`` function implementing incremental
    corpus ingestion with near-dup dedup.

    Per micro-batch: (1) drop exact duplicates inside the batch
    (min-id winner), (2) optionally drop intra-batch near-duplicates
    (LSH self-pairs, min-id winner — without this, two near-dup docs
    arriving in the SAME batch would both pass the corpus check and
    poison it forever), (3) anti-join against near-dups of the current
    corpus snapshot, (4) append survivors to ``corpus_path`` — the
    Delta commit is the transaction boundary, and the O_EXCL
    put-if-absent commit loop makes concurrent ingestors safe.

    Restart safety: each append carries a ``txn`` (SetTransaction)
    action recording ``(app_id, batch_id)`` in the SAME commit as the
    data, and a batch whose id is <= the last committed one is skipped
    — so a micro-batch replayed after a failure is a no-op instead of
    re-appending rows the corpus already holds (the approximate LSH
    corpus check alone can miss exact replays).  This is delta-spark's
    streaming-sink idempotency rule (Delta PROTOCOL.md "Transaction
    Identifiers").

    ``lsh_kwargs`` forward to ``minhash_lsh_pairs(_cross)`` —
    ``num_hashes``/``bands``/``threshold``/``max_bucket``/``n``.
    """
    from ..operators.dedup import dedup_against, exact_dedup, minhash_lsh_pairs
    from ..sources.delta import scan_delta
    from ..sources.delta_sink import write_delta
    from .delta_stream_sink import last_committed_batch

    def ingest(batch: DataFrame, batch_id: int) -> None:
        last = last_committed_batch(corpus_path, app_id)
        if last is not None and batch_id <= last:
            return  # replayed batch — its rows are already durable
        if not batch.take(1):
            return
        spark = batch.sparkSession
        survivors = exact_dedup(batch, id_col=id_col, text_col=text_col)
        if intra_batch:
            pairs = minhash_lsh_pairs(
                survivors, id_col=id_col, text_col=text_col, **lsh_kwargs
            )
            losers = pairs.select(
                F.greatest("id_a", "id_b").alias(id_col)
            ).distinct()
            survivors = survivors.join(
                F.broadcast(losers), id_col, "left_anti"
            )
        try:
            corpus = scan_delta(spark, corpus_path).select(id_col, text_col)
        except FileNotFoundError:
            corpus = None  # first batch bootstraps the corpus
        if corpus is not None:
            survivors = dedup_against(
                survivors,
                corpus,
                id_col=id_col,
                text_col=text_col,
                **lsh_kwargs,
            )
        write_delta(
            survivors,
            corpus_path,
            mode="append",
            extra_actions=[{
                "txn": {
                    "appId": app_id,
                    "version": int(batch_id),
                    "lastUpdated": 0,
                }
            }],
        )

    return ingest
