"""Incremental / streaming consumption of Delta tables.

The reference's only streaming-adjacent feature is pull-based snapshot
advancement (``update_incremental``, delta_meta_retrieval.py:183-201) —
``DeltaSnapshotStream`` wraps that into a micro-batch pull loop that
yields only NEW files per poll (Delta logs are append-only, so the
add-action diff between two snapshots is exactly the new data).

``stream_events`` is the Structured-Streaming extension for the
``events`` table shape: watermarked sliding-window aggregation, the
canonical late-data-tolerant rollup.
"""

from __future__ import annotations

from typing import Iterator, Optional

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from ..plans.meta import MetaState, get_meta


class DeltaSnapshotStream:
    """Pull-based incremental reader: each ``poll()`` advances the
    snapshot and returns a DataFrame of rows added since the last poll
    (None when no new commits).  The planner diff is driver-side and
    O(new files); the returned scan reads only the new files."""

    def __init__(self, spark: SparkSession, path: str, storage_options=None):
        self.spark = spark
        self.state: MetaState = get_meta(path, storage_options=storage_options)
        self._seen: set[str] = set(self.state.add_actions)

    def initial(self) -> DataFrame:
        from ..sources.delta import scan_delta

        return scan_delta(self.spark, self.state)

    def poll(self) -> Optional[DataFrame]:
        self.state.update_incremental()
        new_paths = [p for p in self.state.add_actions if p not in self._seen]
        if not new_paths:
            return None
        self._seen.update(new_paths)
        from ..sources.delta import scan_delta

        filtered = lambda a: a["path"] in set(new_paths)  # noqa: E731
        return scan_delta(self.spark, self.state, action_filter=filtered)


def windowed_event_counts(
    events: DataFrame,
    ts_col: str = "ts",
    key_col: str = "event_type",
    window: str = "1 hour",
    slide: str | None = None,
    watermark: str = "2 hours",
) -> DataFrame:
    """Watermarked (sliding) window aggregation; works identically on a
    batch frame or a ``readStream`` frame — the streaming-native analog
    of ``q_events_hourly``."""
    if events.isStreaming:
        events = events.withWatermark(ts_col, watermark)
    win = F.window(ts_col, window, slide) if slide else F.window(ts_col, window)
    return events.groupBy(win.alias("w"), F.col(key_col)).agg(
        F.count(F.lit(1)).alias("n_events"),
        F.round(F.sum("value"), 2).alias("sum_value"),
    ).select(
        F.col("w.start").alias("window_start"),
        F.col("w.end").alias("window_end"),
        key_col,
        "n_events",
        "sum_value",
    )


def stream_events_from_directory(
    spark: SparkSession, directory: str, schema, **window_kwargs
):
    """File-source structured stream over a directory of event parquet
    drops -> watermarked windowed counts; caller attaches the sink
    (``.writeStream.outputMode('append')...``)."""
    stream = spark.readStream.schema(schema).parquet(directory)
    return windowed_event_counts(stream, **window_kwargs)
