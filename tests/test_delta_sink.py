"""Distributed Delta sink: Spark-written tables read back protocol-correctly."""

from __future__ import annotations

from pyspark.sql import functions as F

from deltalake2db_spark import get_meta, scan_delta
from deltalake2db_spark.sources.delta_sink import write_delta


def _df(spark, lo, hi):
    return spark.range(lo, hi).select(
        F.col("id"),
        (F.col("id") % 3).cast("string").alias("grp"),
        (F.col("id") * 1.5).alias("val"),
    )


def test_write_append_scan(spark, tmp_path):
    path = str(tmp_path / "t")
    v = write_delta(_df(spark, 0, 100), path)
    assert v == 0
    assert scan_delta(spark, path).count() == 100

    v = write_delta(_df(spark, 100, 150), path)
    assert v == 1
    df = scan_delta(spark, path)
    assert df.count() == 150
    assert df.agg(F.sum("id")).collect()[0][0] == sum(range(150))


def test_write_overwrite(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(_df(spark, 0, 100), path)
    write_delta(_df(spark, 0, 10), path, mode="overwrite")
    assert scan_delta(spark, path).count() == 10
    # time travel still sees the first version
    assert scan_delta(spark, path, version=0).count() == 100


def test_write_partitioned_with_stats(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(_df(spark, 0, 300), path, partition_by=["grp"])
    m = get_meta(path)
    assert list(m.partition_columns) == ["grp"]
    # partition pruning works on the written layout
    assert len(list(m.get_add_actions_filtered([("grp", "=", "1")]))) < len(
        m.add_actions
    )
    df = scan_delta(spark, path, conditions=[("grp", "=", "1")])
    assert df.count() == 100
    assert set(df.select("grp").distinct().toPandas()["grp"]) == {"1"}

    # footer stats enable min/max skipping on non-partition columns
    survivors = list(m.get_add_actions_filtered([("id", ">", 10_000)]))
    assert survivors == []


def test_written_table_matches_source(spark, tmp_path):
    path = str(tmp_path / "t")
    src = _df(spark, 0, 50)
    write_delta(src, path, partition_by=["grp"])
    back = scan_delta(spark, path).orderBy("id").collect()
    orig = src.orderBy("id").collect()
    assert [tuple(r) for r in back] == [
        (r["id"], r["grp"], r["val"]) for r in orig
    ]


def test_sink_writes_checkpoint_every_10_commits(spark, tmp_path):
    import os

    path = str(tmp_path / "cp")
    for i in range(11):
        write_delta(_df(spark, i * 10, (i + 1) * 10), path)
    log = os.path.join(path, "_delta_log")
    assert os.path.exists(os.path.join(log, "00000000000000000010.checkpoint.parquet"))
    assert os.path.exists(os.path.join(log, "_last_checkpoint"))
    # a fresh replay bootstraps from the checkpoint and sees every row
    m = get_meta(path)
    assert m.version == 10
    assert scan_delta(spark, path).count() == 110
    # time travel before the checkpoint still works (full JSON replay)
    assert scan_delta(spark, path, version=3).count() == 40


def test_vacuum_finds_only_orphans(spark, tmp_path, stats_table):
    from deltalake2db_spark.sources.delta_sink import vacuum

    # the stats fixture ships one orphan parquet file next to one live
    # file; it is freshly written, so the default 7-day retention window
    # must protect it (an in-flight write's staged files look identical)
    assert vacuum(stats_table, dry_run=True) == []
    orphans = vacuum(stats_table, dry_run=True, retention_hours=0.0)
    assert orphans == ["part-orphan.snappy.parquet"]

    # removed files stay protected (time travel), fresh orphans detected
    import shutil

    path = str(tmp_path / "v")
    shutil.copytree(stats_table, path)
    assert vacuum(path, dry_run=False, retention_hours=0.0) == [
        "part-orphan.snappy.parquet"
    ]
    assert vacuum(path, retention_hours=0.0) == []
    assert scan_delta(spark, path).count() == 1


def test_commit_put_if_absent(tmp_path):
    """Two writers racing for the same version: the loser raises instead
    of truncating the winner's committed transaction."""
    import pyarrow as pa
    import pytest

    from deltalake2db_spark.sources.delta_writer import (
        ConcurrentWriteError,
        DeltaWriter,
        write_simple_delta,
    )

    t = pa.table({"x": [1, 2, 3]})
    path = str(tmp_path / "race")
    write_simple_delta(path, t)  # commits version 0

    loser = DeltaWriter(path)
    loser.version = -1  # stale snapshot: also targets version 0
    with pytest.raises(ConcurrentWriteError):
        loser.commit([loser.protocol_action(1, 2)])
    # the winner's commit is intact
    assert get_meta(path).version == 0
    assert len(get_meta(path).add_actions) == 1


def test_concurrent_write_delta_retries(spark, tmp_path):
    """write_delta re-resolves the snapshot and retries at the next
    version when its target version was committed underneath it."""
    import pyarrow as pa

    from deltalake2db_spark.sources.delta_writer import DeltaWriter
    from deltalake2db_spark.sources.delta_sink import write_delta

    path = str(tmp_path / "retry")
    df = spark.range(5).toDF("id")
    assert write_delta(df, path) == 0

    # simulate a competing writer landing version 1 mid-flight by
    # pre-creating it; write_delta must land on version 2, not clobber
    w = DeltaWriter(path)
    w.version = 0
    w.commit([])
    assert write_delta(spark.range(5, 8).toDF("id"), path) == 2
    assert scan_delta(spark, path).count() == 8


def test_vacuum_full_reclaims_tombstones(spark, tmp_path):
    """mode='full' reclaims files rewritten out of the snapshot (which
    'orphans' keeps forever), and the current snapshot still reads."""
    import os

    from deltalake2db_spark import scan_delta, write_delta
    from deltalake2db_spark.sources.delta_sink import vacuum
    from deltalake2db_spark.sources.maintenance import update_where

    t = str(tmp_path / "vfull")
    write_delta(spark.range(0, 20).selectExpr("id", "id * 2 as v"), t)
    update_where(spark, t, "id < 100", {"v": "v + 1"})  # rewrites all files
    # conservative mode: nothing (old files are log-referenced)
    assert vacuum(t, dry_run=True, retention_hours=0.0) == []
    victims = vacuum(t, dry_run=True, retention_hours=0.0, mode="full")
    assert victims  # the pre-update files
    assert vacuum(t, dry_run=False, retention_hours=0.0, mode="full") == victims
    assert not any(os.path.exists(os.path.join(t, v)) for v in victims)
    got = scan_delta(spark, t)
    assert got.count() == 20
    assert got.agg({"v": "sum"}).collect()[0][0] == sum(2 * i + 1 for i in range(20))
    # time travel before the vacuum horizon now fails
    import pytest

    with pytest.raises(Exception):
        scan_delta(spark, t, version=0).collect()
    # retention protects recent tombstones
    t2 = str(tmp_path / "vfull2")
    write_delta(spark.range(0, 5).selectExpr("id"), t2)
    write_delta(spark.range(5, 9).selectExpr("id"), t2, mode="overwrite")
    assert vacuum(t2, dry_run=True, retention_hours=1.0, mode="full") == []


def test_vacuum_full_keys_on_removal_time(spark, tmp_path):
    """A file WRITTEN long ago but TOMBSTONED just now stays protected
    for the whole retention window (expiry is keyed off the removal,
    not the file's creation mtime) — so time travel / CDF / concurrent
    readers inside the window survive an OPTIMIZE-then-vacuum."""
    import glob
    import os
    import time

    from deltalake2db_spark import scan_delta, write_delta
    from deltalake2db_spark.sources.delta_sink import vacuum

    t = str(tmp_path / "vremoval")
    write_delta(spark.range(0, 10).selectExpr("id"), t)
    # backdate the data files: created 30 days ago
    old = time.time() - 30 * 86400
    for f in glob.glob(os.path.join(t, "*.parquet")):
        os.utime(f, (old, old))
    # ...and tombstone them NOW
    write_delta(spark.range(10, 15).selectExpr("id"), t, mode="overwrite")
    # 7-day retention must keep the just-removed (but old-mtime) files
    assert vacuum(t, dry_run=True, retention_hours=168.0, mode="full") == []
    assert scan_delta(spark, t, version=0).count() == 10  # time travel intact
    # past the window they are reclaimable
    victims = vacuum(t, dry_run=False, retention_hours=0.0, mode="full")
    assert victims
    assert scan_delta(spark, t).count() == 5
