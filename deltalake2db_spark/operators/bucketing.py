"""Bucketed tables — shuffle-free co-located joins.

At 100 TB the dominant recurring cost of a star-schema pipeline is
re-shuffling the fact table for every key join.  Bucketing writes the
table pre-hash-partitioned AND sorted by the join key; two tables
bucketed the same way join with ZERO exchanges (and often zero sorts).
This module wraps the write/read ceremony and gives a plan predicate to
assert the shuffle actually disappeared (used by tests and
tools/explain_audit.py).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table_name: str,
    bucket_cols: list[str],
    num_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist as a bucketed managed table (Spark's bucketing lives in
    the session catalog; plain parquet paths can't carry bucket specs)."""
    writer = df.write.mode(mode).bucketBy(num_buckets, *bucket_cols)
    writer = writer.sortBy(*(sort_cols or bucket_cols))
    writer.format("parquet").saveAsTable(table_name)


def read_bucketed(spark: SparkSession, table_name: str) -> DataFrame:
    return spark.table(table_name)


def join_is_shuffle_free(joined: DataFrame) -> bool:
    """True when the physical plan contains a join but no SHUFFLE
    exchange — the co-located bucketed join worked.  (A
    BroadcastExchange moves only the small side and doesn't count.)"""
    plan = joined._jdf.queryExecution().executedPlan().toString()
    shuffles = plan.replace("BroadcastExchange", "").count("Exchange")
    return "Join" in plan and shuffles == 0
