"""Dataset profiling + skew-resistant aggregation helpers.

``profile`` computes a narrow per-column summary (count / nulls /
distinct / min / max) in ONE pass over the data — a single aggregate
row unpivoted driver-side, so profiling a 100 TB table costs one scan
and shuffles a handful of numbers.

``salted_agg`` is the two-stage aggregation for skewed keys: stage one
aggregates on (key, salt) spreading a hot key over S reducers, stage
two merges the S partials.  Results are exactly equal to the plain
groupBy — only the shuffle distribution changes — so it is verified
against the unsalted oracle.
"""

from __future__ import annotations

from typing import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

_NUMERIC = (
    T.IntegerType, T.LongType, T.ShortType, T.ByteType,
    T.FloatType, T.DoubleType, T.DecimalType,
)


def profile(df: DataFrame, cols: Sequence[str] | None = None) -> DataFrame:
    """Long-format profile: (column, n_rows, n_null, n_distinct,
    min_value, max_value) — min/max stringified (rounded to 4 for
    floats) so one schema fits every column type.

    Distinct counts are EXACT but computed in a separate long-format
    pass: k ``countDistinct`` calls in one aggregate make Catalyst plan
    an Expand (input x(k+1) rows through the exchange — a scale-killer).
    Instead each row explodes into (column, value) pairs and ONE
    single-distinct aggregation counts them — partial aggregation
    collapses duplicates map-side, so the shuffle carries ~distinct
    values per column, never a multiple of the row count.

    Under-parallel inputs (fewer files than cores — e.g. one parquet
    file, which plans as ONE task and serializes the whole distinct
    pass) get the pairs hash-repartitioned by (column, value) first:
    the upstream task then only writes shuffle blocks and the heavy
    distinct aggregation runs at full parallelism.  A big table (files
    >= cores) keeps the map-side-combine plan and never pays that
    extra shuffle of raw pairs.
    """
    cols = list(cols or df.columns)
    by_name = {f.name: f for f in df.schema.fields}
    aggs: list[Column] = [F.count(F.lit(1)).alias("__n")]
    for c in cols:
        dt = by_name[c].dataType
        aggs.append(F.count(F.when(F.col(c).isNull(), 1)).alias(f"__null_{c}"))
        if isinstance(dt, (T.FloatType, T.DoubleType)):
            mn = F.round(F.min(c), 4).cast("string")
            mx = F.round(F.max(c), 4).cast("string")
        else:
            mn = F.min(c).cast("string")
            mx = F.max(c).cast("string")
        aggs.append(mn.alias(f"__min_{c}"))
        aggs.append(mx.alias(f"__max_{c}"))

    row = df.agg(*aggs).collect()[0]

    pairs = df.select(
        F.explode(
            F.array(
                *[
                    F.struct(
                        F.lit(c).alias("column"),
                        F.col(c).cast("string").alias("v"),
                    )
                    for c in cols
                ]
            )
        ).alias("p")
    ).select("p.column", "p.v")
    try:
        n_files = len(df.inputFiles())
    except Exception:  # non-file-backed plan: assume well-partitioned
        n_files = 0
    par = df.sparkSession.sparkContext.defaultParallelism
    if 0 < n_files < max(2, par // 2):
        pairs = pairs.repartition(2 * par, "column", "v")
    dist = {
        r["column"]: r["nd"]
        for r in pairs.groupBy("column")
        .agg(F.count_distinct("v").alias("nd"))
        .collect()
    }
    out = [
        (c, row["__n"], row[f"__null_{c}"], dist.get(c, 0),
         row[f"__min_{c}"], row[f"__max_{c}"])
        for c in cols
    ]
    schema = T.StructType([
        T.StructField("column", T.StringType(), False),
        T.StructField("n_rows", T.LongType(), False),
        T.StructField("n_null", T.LongType(), False),
        T.StructField("n_distinct", T.LongType(), False),
        T.StructField("min_value", T.StringType(), True),
        T.StructField("max_value", T.StringType(), True),
    ])
    return df.sparkSession.createDataFrame(out, schema)


def salted_agg(
    df: DataFrame,
    key: str,
    value: str,
    salt_buckets: int = 16,
) -> DataFrame:
    """Skew-resistant (count, sum) by ``key``: pre-aggregate on
    (key, salt) then merge.  Bit-identical to the plain groupBy for
    count; sums re-associate, so emit rounded sums like every other
    double aggregate."""
    salt = (F.rand(seed=42) * salt_buckets).cast("int")
    stage1 = (
        df.withColumn("__salt", salt)
        .groupBy(key, "__salt")
        .agg(F.count(F.lit(1)).alias("__c"), F.sum(value).alias("__s"))
    )
    return stage1.groupBy(key).agg(
        F.sum("__c").alias("n_rows"),
        F.round(F.sum("__s"), 2).alias("sum_value"),
    )
