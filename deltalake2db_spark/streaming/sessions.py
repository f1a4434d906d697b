"""Sessionization — gap-based session windows over event streams.

Batch formulation: the classic lag/cumsum — one shuffle by user, two
window passes over the same partitioning (Catalyst reuses the sort).
Streaming formulation: ``applyInPandasWithState`` keeps per-user session
state across micro-batches (the custom-stateful-operator path for
semantics Structured Streaming's built-in session window can't express,
e.g. value-dependent gaps).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def sessionize(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    order_tiebreak: str | None = "event_id",
) -> DataFrame:
    """Assign a session id to every event: a new session starts when the
    gap to the previous event of the same user exceeds ``gap_minutes``.

    Single shuffle: both windows share (partitionBy user, orderBy ts)
    so the sort happens once.
    """
    order = [F.col(ts_col).asc()]
    if order_tiebreak:
        order.append(F.col(order_tiebreak).asc())
    w = Window.partitionBy(user_col).orderBy(*order)
    gap_us = int(gap_minutes * 60_000_000)
    us = F.unix_micros(F.col(ts_col))
    new_session = F.when(
        us - F.lag(us).over(w) > gap_us, F.lit(1)
    ).otherwise(F.lit(0))
    running = Window.partitionBy(user_col).orderBy(*order).rowsBetween(
        Window.unboundedPreceding, 0
    )
    return events.withColumn(
        "session_id", F.sum(new_session).over(running).cast("long")
    )


def session_stats(
    events: DataFrame,
    user_col: str = "user_id",
    ts_col: str = "ts",
    gap_minutes: float = 30.0,
    **kwargs,
) -> DataFrame:
    """Per-session rollup: bounds, event count, value sum."""
    s = sessionize(events, user_col, ts_col, gap_minutes, **kwargs)
    return s.groupBy(user_col, "session_id").agg(
        F.min(ts_col).alias("session_start"),
        F.max(ts_col).alias("session_end"),
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    )


SESSION_STATE_SCHEMA = T.StructType(
    [
        T.StructField("last_ts_us", T.LongType()),
        T.StructField("session_id", T.LongType()),
    ]
)

SESSION_OUT_SCHEMA = T.StructType(
    [
        T.StructField("user_id", T.LongType()),
        T.StructField("session_id", T.LongType()),
        T.StructField("n_events", T.LongType()),
    ]
)


def sessionize_stream(
    events: DataFrame,
    gap_minutes: float = 30.0,
    timeout_minutes: int = 60,
):
    """Stateful streaming sessionization via ``applyInPandasWithState``.

    Per-user state = (last event time, current session ordinal); emits
    (user_id, session_id, n_events) per batch.  A production deployment
    adds a state timeout to close idle sessions; partitioning is by
    user, so state shards with the shuffle and scales with executors.
    """
    from pyspark.sql.streaming.state import GroupState, GroupStateTimeout

    gap_us = int(gap_minutes * 60_000_000)

    def update(key, pdfs, state: "GroupState"):
        import pandas as pd

        (user_id,) = key
        if state.exists:
            last_ts, session_id = state.get
        else:
            last_ts, session_id = None, 0
        counts: dict[int, int] = {}
        for pdf in pdfs:
            for ts in sorted(pdf["ts_us"]):
                if last_ts is not None and ts - last_ts > gap_us:
                    session_id += 1
                last_ts = ts
                counts[session_id] = counts.get(session_id, 0) + 1
        state.update((last_ts, session_id))
        yield pd.DataFrame(
            {
                "user_id": [user_id] * len(counts),
                "session_id": list(counts),
                "n_events": list(counts.values()),
            }
        )

    prepped = events.select(
        F.col("user_id"), F.unix_micros(F.col("ts")).alias("ts_us")
    )
    return prepped.groupBy("user_id").applyInPandasWithState(
        update,
        outputStructType=SESSION_OUT_SCHEMA,
        stateStructType=SESSION_STATE_SCHEMA,
        outputMode="append",
        timeoutConf=GroupStateTimeout.NoTimeout,
    )
