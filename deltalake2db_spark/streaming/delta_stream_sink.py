"""Structured Streaming -> Delta: an exactly-once streaming sink built
on ``foreachBatch`` + the transactional ``write_delta`` commit path.

Spark's own Delta streaming sink is delta-spark; this is the same
pattern without it: every micro-batch appends as one atomic Delta
commit, and a ``txn`` (SetTransaction) action recording
``(appId, batchId)`` makes restarts idempotent — a replayed batch whose
id is <= the last committed one is skipped, which is exactly how
delta-spark's streaming sink achieves exactly-once on top of
at-least-once micro-batch delivery (Delta PROTOCOL.md "Transaction
Identifiers").

Scale: the data path is ``write_delta``'s (executors write parquet,
driver commits metadata); stream state (offsets) lives in the Spark
checkpoint dir, dedup state in the Delta log — both O(1) per batch.
"""

from __future__ import annotations

import json
import os
from typing import Optional, Sequence

from pyspark.sql import DataFrame

from ..sources.delta_sink import write_delta


def last_committed_batch(path: str, app_id: str) -> Optional[int]:
    """Highest batchId committed by ``app_id``, from txn actions
    (driver-side log scan, O(commits))."""
    log_dir = os.path.join(str(path).rstrip("/"), "_delta_log")
    if not os.path.isdir(log_dir):
        return None
    best: Optional[int] = None
    for fn in sorted(os.listdir(log_dir)):
        if not (len(fn) == 25 and fn.endswith(".json") and fn[:20].isdigit()):
            continue
        with open(os.path.join(log_dir, fn)) as fh:
            for line in fh:
                if not line.strip():
                    continue
                txn = json.loads(line).get("txn")
                if txn and txn.get("appId") == app_id:
                    v = int(txn.get("version", -1))
                    best = v if best is None else max(best, v)
    return best


def append_batch(
    batch_df: DataFrame,
    batch_id: int,
    path: str,
    app_id: str,
    partition_by: Sequence[str] = (),
) -> bool:
    """Idempotent micro-batch append: skips batches already committed
    under ``app_id`` (restart replay), otherwise appends via
    ``write_delta`` and stamps the (appId, batchId) txn action.
    Returns True when the batch was written."""
    path = str(path).rstrip("/")
    last = last_committed_batch(path, app_id)
    if last is not None and batch_id <= last:
        return False  # replayed batch — already durable
    # the txn marker rides in the SAME commit as the data (atomic):
    # a crash can never leave data committed without its marker, so a
    # replayed batch is either fully present (skipped above) or fully
    # absent (rewritten here) — exactly-once
    version = write_delta(
        batch_df, path, partition_by=partition_by,
        extra_actions=[{"txn": {"appId": app_id, "version": int(batch_id),
                                "lastUpdated": 0}}],
    )
    return version >= 0


def write_stream_to_delta(
    stream_df: DataFrame,
    path: str,
    checkpoint_dir: str,
    app_id: str = "dl2db-stream",
    partition_by: Sequence[str] = (),
    trigger_once: bool = True,
):
    """Attach the Delta sink to a streaming DataFrame.

    ``trigger_once=True`` drains all available data and stops (the
    batch-job-on-a-schedule pattern); pass False for a continuous
    micro-batch stream the caller manages.
    """

    def _sink(batch_df: DataFrame, batch_id: int) -> None:
        append_batch(batch_df, batch_id, path, app_id, partition_by)

    writer = (
        stream_df.writeStream.foreachBatch(_sink)
        .option("checkpointLocation", checkpoint_dir)
        .outputMode("append")
    )
    if trigger_once:
        writer = writer.trigger(availableNow=True)
    return writer.start()
