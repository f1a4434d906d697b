"""Sequence packing: group documents into fixed token-budget packs.

LLM pretraining concatenates documents into fixed-length training
sequences; the packing step assigns each document to a pack so that
packs hold ~``budget`` tokens.  Optimal bin packing is NP-hard and
inherently sequential — the scalable, deterministic industry shape is
**streaming offset packing**: lay documents end-to-end in a stable
order and cut at budget boundaries.

Semantics (documented contract, oracle-checked):

    pack_id = floor(start_offset / budget)

where ``start_offset`` is the running token count of all *earlier*
documents in the stream.  A document starting inside pack K belongs to
pack K even if it crosses the boundary — packs may overflow by at most
one document (exactly how a tokenizer-side packer consumes them; the
trainer truncates or rolls the tail into the next sequence).

Scale design
------------
A single global running sum would serialize the corpus.  Instead the
stream is partitioned (by ``part_col``, e.g. ``source`` — at crawl
scale, the shard/file id): each partition packs independently with one
window sort, so 1000 executors pack 1000 streams concurrently, and
pack ids are made globally unique as ``(partition, local_pack)``.
Window input is ``(key, tokens)`` only — the document body never
enters the shuffle.
"""

from __future__ import annotations

from typing import Optional

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def pack_sequences(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_col: str,
    part_col: Optional[str] = None,
    out: str = "pack_id",
) -> DataFrame:
    """Assign a pack id by streaming offset packing (see module doc).

    One shuffle (the window partition/sort).  ``order_col`` must be a
    stable unique key (doc_id) so the layout is deterministic across
    runs and engines.
    """
    parts = [part_col] if part_col else []
    w = (
        Window.partitionBy(*parts)
        .orderBy(F.col(order_col).asc())
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    start = (F.sum(F.col(tokens_col)).over(w) - F.col(tokens_col)).cast(
        "bigint"
    )
    return df.withColumn(out, F.floor(start / F.lit(budget)))


def pack_stats(
    df: DataFrame,
    tokens_col: str,
    budget: int,
    order_col: str,
    part_col: Optional[str] = None,
) -> DataFrame:
    """Pack-level fill report: docs per pack, token sum, fill ratio.

    The fill ratio distribution is the packing-efficiency metric a
    pipeline monitors (overflow waste vs padding waste).
    """
    parts = [part_col] if part_col else []
    packed = pack_sequences(df, tokens_col, budget, order_col, part_col)
    return (
        packed.groupBy(*parts, "pack_id")
        .agg(
            F.count(F.lit(1)).alias("n_docs"),
            F.sum(tokens_col).alias("pack_tokens"),
        )
        .withColumn(
            "fill_pct",
            F.round(F.col("pack_tokens") * 100.0 / F.lit(budget), 2),
        )
    )
