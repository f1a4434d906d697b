"""ALTER TABLE DDL: enable_column_mapping / add / rename / drop column
(sources/maintenance.py) — all metadata-only commits."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deltalake2db_spark import get_meta, scan_delta
from deltalake2db_spark.sources.delta_sink import write_delta
from deltalake2db_spark.sources.maintenance import (
    add_column,
    drop_column,
    enable_column_mapping,
    rename_column,
)


def _table(spark, path):
    df = spark.range(0, 100).selectExpr(
        "id", "id % 5 as g", "cast(id * 1.5 as double) as v"
    )
    write_delta(df, str(path))
    return str(path)


def test_rename_requires_mapping(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    with pytest.raises(ValueError, match="columnMapping"):
        rename_column(spark, t, "v", "value")


def test_upgrade_then_rename_drop(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    before = scan_delta(spark, t).orderBy("id").collect()

    enable_column_mapping(spark, t)
    # upgrade is invisible to reads (physical names == old names)
    assert scan_delta(spark, t).orderBy("id").collect() == before
    st = get_meta(t)
    assert st.protocol["minReaderVersion"] >= 2
    assert st.protocol["minWriterVersion"] >= 5

    rename_column(spark, t, "v", "value")
    got = scan_delta(spark, t).orderBy("id").collect()
    assert got[3]["value"] == before[3]["v"]  # same data, new label
    assert "v" not in scan_delta(spark, t).columns

    drop_column(spark, t, "g")
    assert scan_delta(spark, t).columns == ["id", "value"]
    # time travel still sees the old shape
    assert "g" in scan_delta(spark, t, version=0).columns


def test_add_column_null_backfill(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    add_column(spark, t, "note", "string")
    df = scan_delta(spark, t)
    assert df.columns == ["id", "g", "v", "note"]
    assert df.filter(F.col("note").isNotNull()).count() == 0

    # appends after the DDL carry the new column; old files backfill
    new = spark.range(100, 110).selectExpr(
        "id", "id % 5 as g", "cast(id * 1.5 as double) as v",
        "'x' as note",
    )
    write_delta(new, t)
    assert scan_delta(spark, t).filter(F.col("note") == "x").count() == 10
    assert scan_delta(spark, t).count() == 110


def test_add_column_on_mapped_table_gets_fresh_physical_name(spark, tmp_path):
    import json

    t = _table(spark, tmp_path / "t")
    enable_column_mapping(spark, t)
    add_column(spark, t, "note", "string")
    sj = json.loads(get_meta(t).last_metadata["schemaString"])
    f = next(f for f in sj["fields"] if f["name"] == "note")
    assert f["metadata"]["delta.columnMapping.physicalName"].startswith("col-")
    cfg = get_meta(t).last_metadata["configuration"]
    assert int(cfg["delta.columnMapping.maxColumnId"]) == 4


def test_rename_partition_column(spark, tmp_path):
    df = spark.range(0, 60).selectExpr("id", "id % 3 as g")
    t = str(tmp_path / "t")
    write_delta(df, t, partition_by=["g"])
    enable_column_mapping(spark, t)
    rename_column(spark, t, "g", "grp")
    assert get_meta(t).partition_columns == ["grp"]
    assert scan_delta(
        spark, t, conditions=[("grp", "=", 1)]
    ).count() == 20


def test_append_to_mapped_table_writes_physical_names(spark, tmp_path):
    """write_delta on a mapped table must store PHYSICAL parquet names
    (a fresh col-NN column would otherwise be written under its logical
    label and read back as all-NULL)."""
    t = _table(spark, tmp_path / "t")
    enable_column_mapping(spark, t)
    add_column(spark, t, "note", "string")
    rename_column(spark, t, "v", "value")
    new = spark.range(100, 105).selectExpr(
        "id", "id % 5 as g", "cast(id * 1.5 as double) as value",
        "'y' as note",
    )
    write_delta(new, t)
    df = scan_delta(spark, t)
    assert df.filter(F.col("note") == "y").count() == 5
    assert df.filter(F.col("value") > 149).count() == 5
    assert df.count() == 105
