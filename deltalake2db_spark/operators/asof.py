"""As-of join (point-in-time lookup) — an operator Spark lacks natively.

Two implementations with identical semantics:

 - ``asof_join``: pure DataFrame composition — range join + row_number.
   Catalyst can't know only the latest right row matters, so the join
   materializes all earlier right rows per left row before the window
   trims them; fine when the right side per key is modest.
 - ``asof_join_union``: the scale path — union the two sides tagged,
   sort within key-partitions once, and carry the latest right-side
   values forward with ``last(ignorenulls)`` over a single window.  One
   shuffle (by key), no join blow-up, no skew amplification: this is
   the classic log-merge formulation used at 100 TB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    tolerance=None,
) -> DataFrame:
    """For each left row, attach the latest right row with
    right_ts <= left_ts (optionally within ``tolerance``)."""
    lcols = left.columns
    # key the dedup window on a generated row id, NOT the left row's
    # columns: duplicate left rows are distinct join inputs and must each
    # keep their match (and a full-row composite key would shuffle wide)
    left_id = left.withColumn("__l_id", F.monotonically_increasing_id())
    r = right.select(
        F.col(on).alias("__r_key"),
        F.col(right_ts).alias("__r_ts"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
    )
    cond = (F.col(on) == F.col("__r_key")) & (F.col("__r_ts") <= F.col(left_ts))
    if tolerance is not None:
        cond = cond & (F.col("__r_ts") >= F.col(left_ts) - tolerance)
    joined = left_id.join(r, cond, "left")
    w = Window.partitionBy("__l_id").orderBy(F.col("__r_ts").desc())
    out = (
        joined.withColumn("__rn", F.row_number().over(w))
        .filter(F.col("__rn") == 1)
        .drop("__rn", "__r_key", "__l_id")
    )
    renames = {"__r_ts": f"{right_ts}_right"}
    out = out.withColumnRenamed("__r_ts", renames["__r_ts"])
    for c in right_cols:
        out = out.withColumnRenamed(f"__r_{c}", c)
    return out


def asof_join_union(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str,
    right_ts: str,
    right_cols: list[str],
    right_tiebreak: str | None = None,
) -> DataFrame:
    """Log-merge as-of join: single shuffle by key, no pair explosion.

    Union(left tagged 1, right tagged 0) sorted by (key, ts, tag) —
    right rows sort before left rows at equal ts so `<=` semantics hold —
    then last(right_value, ignorenulls) over the running window is the
    as-of value for every left row.  ``right_tiebreak`` makes the winner
    among equal-ts right rows deterministic (max tiebreak wins).
    """
    lcols = left.columns
    tb_type = right.schema[right_tiebreak].dataType if right_tiebreak else None
    l_tag = left.select(
        F.col(on).alias("__key"),
        F.col(left_ts).alias("__ts"),
        F.lit(1).alias("__is_left"),
        F.struct(*lcols).alias("__l"),
        *[F.lit(None).cast(right.schema[c].dataType).alias(f"__r_{c}") for c in right_cols],
        F.lit(None).cast(right.schema[right_ts].dataType).alias("__r_ts"),
        *([F.lit(None).cast(tb_type).alias("__tb")] if right_tiebreak else []),
    )
    r_tag = right.select(
        F.col(on).alias("__key"),
        F.col(right_ts).alias("__ts"),
        F.lit(0).alias("__is_left"),
        F.lit(None).cast(l_tag.schema["__l"].dataType).alias("__l"),
        *[F.col(c).alias(f"__r_{c}") for c in right_cols],
        F.col(right_ts).alias("__r_ts"),
        *([F.col(right_tiebreak).alias("__tb")] if right_tiebreak else []),
    )
    merged = l_tag.unionByName(r_tag)
    order = [F.col("__ts").asc(), F.col("__is_left").asc()]
    if right_tiebreak:
        order.append(F.col("__tb").asc_nulls_first())
    w = (
        Window.partitionBy("__key")
        .orderBy(*order)
        .rowsBetween(Window.unboundedPreceding, 0)
    )
    carried = merged.select(
        "__is_left",
        "__l",
        *[F.last(f"__r_{c}", ignorenulls=True).over(w).alias(f"__c_{c}") for c in right_cols],
        F.last("__r_ts", ignorenulls=True).over(w).alias("__c_ts"),
    ).filter(F.col("__is_left") == 1)
    out = carried.select(
        *[F.col(f"__l.{c}").alias(c) for c in lcols],
        F.col("__c_ts").alias(f"{right_ts}_right"),
        *[F.col(f"__c_{c}").alias(c) for c in right_cols],
    )
    return out
