"""Deterministic shard assignment + export for training-data delivery.

The last stage of a data pipeline hands the corpus to a trainer as N
stable shards (so data order is reproducible across re-runs and
resumable mid-epoch).  Requirements, mirrored from the sampling module:

* **Stable assignment** — ``shard(row)`` depends only on the row key,
  never on partitioning or execution order: the same Knuth
  multiplicative hash as ``operators.sampling`` (plain integer
  arithmetic, so any engine — and the DuckDB oracle — recomputes it).
* **Map-side assignment** — a projection, zero shuffles; the only
  shuffle in the export is the one ``repartition`` that physically
  groups each shard, which is also exactly the shuffle a 1000-executor
  write needs (one task per shard, no stragglers because the hash is
  uniform).
* **Deterministic within-shard order** — ``sortWithinPartitions`` on
  (shard, sort key): a trainer streaming shard files sees one canonical
  order.

``shard_stats`` is the audit table a pipeline records next to the
export (doc counts, token mass, key range, and an exact integer
checksum per shard) — all BIGINT arithmetic, hash-matched by the
oracle gate.

The reference engine has no export/sharding surface (SURVEY.md §2.5);
north-star extension.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .sampling import _KNUTH, _MOD, sample_hash


def shard_of(key: Column, n_shards: int, salt: int = 0) -> Column:
    """Deterministic shard id in [0, n_shards) from an integer key."""
    h = F.pmod(key.cast("bigint") * F.lit(_KNUTH) + F.lit(salt), F.lit(_MOD))
    return F.pmod(h, F.lit(n_shards)).cast("int")


def assign_shards(
    df: DataFrame, key: str, n_shards: int, salt: int = 0, out: str = "shard"
) -> DataFrame:
    """Add the shard column — pure map-side projection."""
    return df.withColumn(out, shard_of(F.col(key), n_shards, salt))


def shard_stats(
    df: DataFrame,
    key: str,
    n_shards: int,
    size_col: str | None = None,
    salt: int = 0,
) -> DataFrame:
    """Per-shard audit row: ``(shard, n_rows, total_size, min_key,
    max_key, key_checksum)``.

    ``key_checksum`` = sum of the rows' full 31-bit hashes — an exact
    BIGINT invariant of shard MEMBERSHIP (not order), recomputable by
    any engine to certify two exports contain identical row sets.
    """
    h = F.pmod(
        F.col(key).cast("bigint") * F.lit(_KNUTH) + F.lit(salt), F.lit(_MOD)
    )
    size = F.sum(F.col(size_col)) if size_col else F.count(F.lit(1))
    return (
        assign_shards(df, key, n_shards, salt)
        .groupBy("shard")
        .agg(
            F.count(F.lit(1)).alias("n_rows"),
            size.alias("total_size"),
            F.min(key).alias("min_key"),
            F.max(key).alias("max_key"),
            F.sum(h).alias("key_checksum"),
        )
    )


def write_shards(
    df: DataFrame,
    path: str,
    key: str,
    n_shards: int,
    salt: int = 0,
    sort_cols: list[str] | None = None,
) -> None:
    """Export the corpus as ``path/shard=K/`` parquet, one file per
    shard, rows in canonical (hash, key) order inside each file.

    ``repartition(n_shards, shard)`` gives one writer task per shard —
    at 100 TB the shard count (thousands) IS the write parallelism, and
    uniform hashing keeps tasks even.  Re-running the export over the
    same input produces byte-stable shard contents.
    """
    sort_cols = sort_cols or [key]
    tagged = assign_shards(df, key, n_shards, salt)
    (
        tagged.repartition(n_shards, "shard")
        .sortWithinPartitions("shard", *sort_cols)
        .write.mode("overwrite")
        .partitionBy("shard")
        .parquet(path)
    )
