"""Python Data Source: spark.read.format('deltalake2db')."""

from __future__ import annotations

import pytest
from pyspark.sql import types as T


@pytest.fixture(scope="module")
def registered(spark):
    from deltalake2db_spark.sources.pyds import register

    register(spark)
    return spark


def test_pyds_user_table(registered, user_table):
    df = registered.read.format("deltalake2db").option("path", user_table).load()
    assert df.count() == 3
    rows = sorted(df.collect(), key=lambda r: r["User - iD"])
    assert [r["FirstName"] for r in rows] == ["John", "Peter", "Petra"]
    st = {f.name: f.dataType for f in df.schema.fields}
    assert st["Age"] == T.DecimalType(15, 3)
    assert st["__timestamp"] == T.TimestampNTZType()


def test_pyds_column_mapping_and_partitions(registered, faker2_table):
    df = registered.read.format("deltalake2db").option("path", faker2_table).load()
    assert df.columns[:2] == ["Super Name", "Company Very Short"]
    rows = df.collect()
    assert len(rows) == 6
    hans = [r for r in rows if r["Super Name"] == "hans"][0]
    assert hans["main_coord"] is None          # NULL struct preserved
    assert hans["Company Very Short"] is None  # NULL partition
    bms = [r for r in rows if r["Company Very Short"] == "BMS"]
    assert len(bms) == 4
    assert bms[0]["main_coord"]["lat"] is not None  # logical nested names


def test_pyds_time_travel_and_conditions(registered, faker2_table):
    df = (registered.read.format("deltalake2db")
          .option("path", faker2_table).option("version", "0").load())
    assert "new_name" not in df.columns and df.count() == 3

    import json

    df = (registered.read.format("deltalake2db")
          .option("path", faker2_table)
          .option("conditions", json.dumps([["Company Very Short", "=", "BMS"]]))
          .load())
    # planner-side pruning: only BMS files read (row filter is the
    # user's job with the DS API; pruning here is file-level)
    assert df.count() == 4


def test_pyds_empty_table(registered, user_empty_table):
    df = registered.read.format("deltalake2db").option("path", user_empty_table).load()
    assert df.count() == 0
    assert len(df.columns) == 9
