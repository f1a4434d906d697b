"""F7-style roundtrip differential tests (FIXTURES.md F7 /
tests/test_polars_read.py in the reference): write with our Delta
writer, read back with scan_delta, compare against the same data read
directly — including partitioned layouts, appends, filters and
projections."""

from __future__ import annotations

from datetime import datetime

import pyarrow as pa
import pytest
from pyspark.sql import functions as F

from deltalake2db_spark import scan_delta
from deltalake2db_spark.sources.delta_writer import DeltaWriter, write_simple_delta


def _batch() -> pa.Table:
    return pa.table(
        {
            "foo": pa.array(range(1, 10), pa.int64()),
            "bar": pa.array([str(i) for i in range(1, 10)]),
            "date_month": pa.array([201001 + i for i in range(9)], pa.int64()),
            "datetime": pa.array(
                [datetime(2010, i + 1, 1) for i in range(9)], pa.timestamp("us")
            ),
            "static_part": pa.array(["A"] * 3 + ["B"] * 3 + ["C"] * 3),
        }
    )


def test_roundtrip_unpartitioned_append(spark, tmp_path):
    path = str(tmp_path / "t")
    w = write_simple_delta(path, _batch())
    assert scan_delta(spark, path).count() == 9
    w.commit([w.add_data_file(_batch())])  # append
    df = scan_delta(spark, path)
    assert df.count() == 18
    assert df.filter(F.col("foo") == 5).count() == 2


def test_roundtrip_partitioned(spark, tmp_path):
    path = str(tmp_path / "t")
    write_simple_delta(
        path, _batch(), partition_by=["date_month", "static_part"],
        delta_types={"date_month": "long", "static_part": "string"},
    )
    df = scan_delta(spark, path)
    assert df.count() == 9
    # partition columns come back typed
    types = {f.name: f.dataType.simpleString() for f in df.schema.fields}
    assert types["date_month"] == "bigint"
    assert types["static_part"] == "string"

    # filters over partition and data columns
    assert scan_delta(spark, path, conditions=[("foo", ">", 5)]).count() == 4
    got = scan_delta(
        spark, path,
        conditions=[("static_part", "=", "A"), ("date_month", "in", [201001, 201002])],
    ).collect()
    assert sorted(r["foo"] for r in got) == [1, 2]

    # projection
    assert scan_delta(spark, path, select=["foo"]).columns == ["foo"]

    # pruning happened at the planner level: only matching files survive
    from deltalake2db_spark import get_meta

    m = get_meta(path)
    survivors = list(
        m.get_add_actions_filtered([("static_part", "=", "A"),
                                     ("date_month", "in", [201001, 201002])])
    )
    assert len(survivors) == 2  # one file per (month, part) combo


def test_roundtrip_matches_direct_read(spark, tmp_path):
    """Whole-frame equality vs reading the same rows through plain
    Spark (the reference's assert_frame_equal differential)."""
    path = str(tmp_path / "t")
    write_simple_delta(
        path, _batch(), partition_by=["static_part"],
        delta_types={"static_part": "string"},
    )
    via_delta = scan_delta(spark, path).orderBy("foo").collect()
    import pandas as pd

    direct = spark.createDataFrame(_batch().to_pandas()).orderBy("foo").collect()
    assert [tuple(r) for r in via_delta] == [
        tuple((r["foo"], r["bar"], r["date_month"], r["datetime"], r["static_part"]))
        for r in direct
    ]


def test_remove_action_roundtrip(spark, tmp_path):
    path = str(tmp_path / "t")
    w = write_simple_delta(path, _batch())
    first_file = next(iter(w._adds))
    add2 = w.add_data_file(_batch())
    w.commit([add2, w.remove_action(first_file)])
    # only the second file is live
    assert scan_delta(spark, path).count() == 9
    assert scan_delta(spark, path, version=0).count() == 9
    assert scan_delta(spark, path, version=1).count() == 9
