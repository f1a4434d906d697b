"""Sessionization: batch lag/cumsum vs stateful streaming agreement."""

from __future__ import annotations

import os
from datetime import datetime, timedelta

import pytest
from pyspark.sql import functions as F

from deltalake2db_spark.streaming.sessions import (
    session_stats,
    sessionize,
    sessionize_stream,
)


@pytest.fixture(scope="module")
def events(spark):
    base = datetime(2024, 1, 1, 10, 0)
    rows = []
    eid = 0
    for user in (1, 2):
        # session 0: 3 events 5min apart; gap 2h; session 1: 2 events
        for m in (0, 5, 10):
            rows.append((eid, user, base + timedelta(minutes=m), 1.0)); eid += 1
        for m in (130, 140):
            rows.append((eid, user, base + timedelta(minutes=m), 2.0)); eid += 1
    return spark.createDataFrame(rows, ["event_id", "user_id", "ts", "value"])


def test_sessionize_batch(events):
    s = sessionize(events, gap_minutes=30.0)
    per = {(r["user_id"], r["event_id"]): r["session_id"] for r in s.collect()}
    assert per[(1, 0)] == 0 and per[(1, 1)] == 0 and per[(1, 2)] == 0
    assert per[(1, 3)] == 1 and per[(1, 4)] == 1

    stats = session_stats(events, gap_minutes=30.0).collect()
    by_key = {(r["user_id"], r["session_id"]): r for r in stats}
    assert by_key[(1, 0)]["n_events"] == 3
    assert by_key[(1, 1)]["n_events"] == 2
    assert by_key[(2, 0)]["sum_value"] == 3.0


def test_sessionize_stream_agrees_with_batch(spark, events, tmp_path):
    """Feed the same events through applyInPandasWithState via a file
    stream; the per-session event counts must match the batch result."""
    src = str(tmp_path / "stream_src")
    os.makedirs(src, exist_ok=True)
    events.coalesce(1).write.parquet(src, mode="overwrite")

    stream = spark.readStream.schema(events.schema).parquet(src)
    out = sessionize_stream(stream, gap_minutes=30.0)
    q = (
        out.writeStream.format("memory")
        .queryName("sessions_test")
        .outputMode("append")
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(60)
    got = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in spark.sql("select * from sessions_test").collect()
    }
    batch = {
        (r["user_id"], r["session_id"]): r["n_events"]
        for r in session_stats(events, gap_minutes=30.0).collect()
    }
    assert got == batch


def test_bpe_ish_tokens(spark):
    from deltalake2db_spark.operators.text import bpe_ish_token_count

    df = spark.createDataFrame(
        [(1, "hello, world! 42"), (2, "internationalization")], ["id", "t"]
    )
    out = {r["id"]: r["n"] for r in df.select(
        "id", bpe_ish_token_count(F.col("t")).alias("n")).collect()}
    # hello , world ! 4 2  => 6 pieces; "hello"/"world" length-5 add +1 each
    assert out[1] == 8
    # one 20-char word: 1 piece + (20-1)//4 = 4 extra
    assert out[2] == 5
