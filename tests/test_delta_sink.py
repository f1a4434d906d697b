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
