"""Range (interval) join — equi-join on coarse time bins + residual
filter, instead of the naive inequality join Spark would plan as a
broadcast-nested-loop.

For `left.ts in [right.start, right.end)` with bounded interval length
L: bin both sides at width >= L; a matching pair's bins differ by at
most 1, so candidates come from an EQUI-join on (key, bin) with the
right side exploded into the bins its interval touches.  Shuffle is
hash-partitioned and AQE-skew-splittable — the plan shape that survives
1000 executors (a raw `BETWEEN` join has no equi-condition and degrades
to nested-loop).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def range_join_point_interval(
    points: DataFrame,
    intervals: DataFrame,
    key: str,
    point_ts: str,
    start_ts: str,
    end_ts: str,
    bin_micros: int,
    broadcast: str | None = None,
) -> DataFrame:
    """Rows (point, interval) where point_ts in [start_ts, end_ts) and
    keys match.  ``bin_micros`` must be >= the maximum interval length.

    Returns all columns of both inputs (interval columns suffixed _r
    when names collide).

    ``broadcast='intervals'`` hints the exploded interval side into a
    broadcast-hash join — the right call when intervals are a filtered
    sliver of a big table (Catalyst's post-filter size estimate is too
    coarse to pick it on its own, and the point side then never
    shuffles at all).  Default leaves the strategy to Catalyst/AQE.
    """
    p_us = F.unix_micros(F.col(point_ts))

    p = points.withColumn("__bin", (p_us / F.lit(bin_micros)).cast("long"))
    rename = {
        c: f"{c}_r" for c in intervals.columns if c in points.columns and c != key
    }
    start_col = rename.get(start_ts, start_ts)
    end_col = rename.get(end_ts, end_ts)
    # bin bounds must reference the RENAMED columns — building them from
    # the original names broke whenever start/end collided with a point
    # column (caught by the synthetic-frame oracle test)
    s_us = F.unix_micros(F.col(start_col))
    e_us = F.unix_micros(F.col(end_col))
    bins = F.sequence(
        (s_us / F.lit(bin_micros)).cast("long"),
        (e_us / F.lit(bin_micros)).cast("long"),
    )
    r = intervals.select(
        *[F.col(c).alias(rename.get(c, c)) for c in intervals.columns]
    ).withColumn("__bin", F.explode(bins))
    if broadcast == "intervals":
        r = F.broadcast(r)
    joined = p.join(r, [key, "__bin"]).filter(
        (F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col))
    )
    return joined.drop("__bin")
