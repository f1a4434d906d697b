"""Writer-protocol obligations: delta.appendOnly and column invariants.

PROTOCOL.md writer version 2 requires a writer to (a) reject any
non-append commit on ``delta.appendOnly=true`` tables and (b) enforce
column invariants (NOT NULL nullability + ``delta.invariants`` field
metadata).  The reference is read-only and has neither; delta-spark's
behavior is the model.
"""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F
from pyspark.sql import types as T

from deltalake2db_spark import (
    DeltaAppendOnlyError,
    DeltaInvariantError,
    delete_where,
    merge_into,
    restore_table,
    scan_delta,
    update_where,
    write_delta,
)


def _mk(spark, path, conf=None):
    write_delta(
        spark.range(0, 10).selectExpr("id", "id * 2 as v"),
        path,
        configuration=conf,
    )


def test_append_only_blocks_mutation(spark, tmp_path_factory):
    t = str(tmp_path_factory.mktemp("proto") / "ao")
    _mk(spark, t, conf={"delta.appendOnly": "true"})
    # appends keep working
    write_delta(spark.range(10, 15).selectExpr("id", "id * 2 as v"), t)
    assert scan_delta(spark, t).count() == 15
    with pytest.raises(DeltaAppendOnlyError):
        write_delta(
            spark.range(0, 3).selectExpr("id", "id * 2 as v"),
            t,
            mode="overwrite",
        )
    with pytest.raises(DeltaAppendOnlyError):
        delete_where(spark, t, "id < 5")
    with pytest.raises(DeltaAppendOnlyError):
        update_where(spark, t, "id < 5", {"v": F.lit(0).cast("bigint")})
    with pytest.raises(DeltaAppendOnlyError):
        merge_into(
            spark,
            t,
            spark.range(0, 3).selectExpr("id", "id * 3 as v"),
            on=["id"],
            when_matched_update="all",
        )
    with pytest.raises(DeltaAppendOnlyError):
        restore_table(spark, t, 0)
    # nothing above committed
    assert scan_delta(spark, t).count() == 15


def test_not_null_invariant_enforced(spark, tmp_path_factory):
    t = str(tmp_path_factory.mktemp("proto") / "nn")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), nullable=False),
            T.StructField("v", T.StringType(), nullable=True),
        ]
    )
    write_delta(
        spark.createDataFrame([(1, "a"), (2, None)], schema), t
    )
    # valid append passes
    write_delta(spark.createDataFrame([(3, "c")], schema), t)
    bad = spark.createDataFrame(
        [(None, "x")],
        T.StructType(
            [
                T.StructField("id", T.LongType(), nullable=True),
                T.StructField("v", T.StringType(), nullable=True),
            ]
        ),
    )
    with pytest.raises(DeltaInvariantError, match="id NOT NULL"):
        write_delta(bad, t)
    assert scan_delta(spark, t).count() == 3


def test_expression_invariant_enforced(spark, tmp_path_factory):
    t = str(tmp_path_factory.mktemp("proto") / "inv")
    inv = json.dumps({"expression": {"expression": "v > 0"}})
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField(
                "v", T.LongType(), True, metadata={"delta.invariants": inv}
            ),
        ]
    )
    write_delta(spark.createDataFrame([(1, 5), (2, 9)], schema), t)
    # NULL passes (delta-spark only throws on explicit false)
    write_delta(spark.createDataFrame([(3, None)], schema), t)
    with pytest.raises(DeltaInvariantError, match="v > 0"):
        write_delta(spark.createDataFrame([(4, -1)], schema), t)
    assert scan_delta(spark, t).count() == 3
