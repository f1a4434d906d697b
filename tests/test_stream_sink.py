"""Structured Streaming -> Delta sink (streaming/delta_stream_sink.py):
exactly-once micro-batch appends with txn idempotence markers."""

from __future__ import annotations

import json
import os

from deltalake2db_spark import scan_delta
from deltalake2db_spark.streaming.delta_stream_sink import (
    append_batch,
    last_committed_batch,
    write_stream_to_delta,
)


def test_stream_drains_directory_to_delta(spark, tmp_path):
    src = tmp_path / "in"
    src.mkdir()
    df1 = spark.range(0, 100).selectExpr("id", "id % 3 as g")
    df1.coalesce(1).write.mode("append").parquet(str(src))

    table = str(tmp_path / "tbl")
    q = write_stream_to_delta(
        spark.readStream.schema("id long, g long").parquet(str(src)),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        app_id="t1",
    )
    q.awaitTermination(60)
    assert scan_delta(spark, table).count() == 100

    # second drop + restart drains only the new data (offsets from the
    # stream checkpoint, batch ids from the txn markers)
    spark.range(100, 150).selectExpr("id", "id % 3 as g").coalesce(
        1
    ).write.mode("append").parquet(str(src))
    q2 = write_stream_to_delta(
        spark.readStream.schema("id long, g long").parquet(str(src)),
        table,
        checkpoint_dir=str(tmp_path / "ckpt"),
        app_id="t1",
    )
    q2.awaitTermination(60)
    assert scan_delta(spark, table).count() == 150


def test_replayed_batch_skipped(spark, tmp_path):
    table = str(tmp_path / "tbl")
    df = spark.range(0, 10).selectExpr("id", "id % 3 as g")
    assert append_batch(df, 0, table, "app") is True
    assert append_batch(df, 0, table, "app") is False  # replay: no-op
    assert append_batch(df, 1, table, "app") is True
    assert scan_delta(spark, table).count() == 20
    assert last_committed_batch(table, "app") == 1
    assert last_committed_batch(table, "other-app") is None


def test_txn_marker_atomic_with_data(spark, tmp_path):
    """The txn action lives in the SAME commit as the add actions."""
    table = str(tmp_path / "tbl")
    append_batch(
        spark.range(0, 5).selectExpr("id", "id % 3 as g"), 7, table, "app"
    )
    log = os.path.join(table, "_delta_log", f"{0:020d}.json")
    kinds = [next(iter(json.loads(x))) for x in open(log) if x.strip()]
    assert "txn" in kinds and "add" in kinds
