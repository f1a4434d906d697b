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


def test_generated_columns(spark, tmp_path_factory):
    """delta.generationExpression: absent columns are computed on
    write, present columns are validated, creation raises writer v4."""
    from deltalake2db_spark.plans.meta import get_meta

    t = str(tmp_path_factory.mktemp("proto") / "gen")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField(
                "bucket",
                T.LongType(),
                True,
                metadata={"delta.generationExpression": "id % 4"},
            ),
        ]
    )
    write_delta(
        spark.createDataFrame([(i, i % 4) for i in range(8)], schema), t
    )
    assert get_meta(t).protocol["minWriterVersion"] == 4
    # append WITHOUT the generated column: filled from the expression
    write_delta(spark.createDataFrame([(100,)], "id long"), t)
    got = {r["id"]: r["bucket"] for r in scan_delta(spark, t).collect()}
    assert got[100] == 0 and got[7] == 3
    # append with WRONG values: rejected
    with pytest.raises(DeltaInvariantError, match="generated column"):
        write_delta(spark.createDataFrame([(101, 99)], schema), t)
    # creation with wrong values: rejected too
    t2 = str(tmp_path_factory.mktemp("proto") / "gen2")
    with pytest.raises(DeltaInvariantError, match="generated column"):
        write_delta(spark.createDataFrame([(1, 5)], schema), t2)


def test_generated_partition_column_prunes(spark, tmp_path_factory):
    """The canonical use: partition by a generated date-derived column
    and let the scan prune on it."""
    t = str(tmp_path_factory.mktemp("proto") / "genpart")
    schema = T.StructType(
        [
            T.StructField("id", T.LongType(), True),
            T.StructField(
                "part",
                T.LongType(),
                True,
                metadata={"delta.generationExpression": "id % 3"},
            ),
        ]
    )
    write_delta(
        spark.createDataFrame([(i, i % 3) for i in range(9)], schema),
        t,
        partition_by=["part"],
    )
    # append without the column: computed, lands in the right partition
    write_delta(
        spark.createDataFrame([(30,)], "id long"), t, partition_by=["part"]
    )
    pruned = scan_delta(spark, t, conditions=[("part", "=", 0)])
    rows = sorted(r["id"] for r in pruned.collect())
    assert rows == [0, 3, 6, 30]
    # partition pruning actually dropped the other files
    assert all("part=0" in f for f in pruned.inputFiles())


def test_replace_where_partition_scoped_overwrite(spark, tmp_path_factory):
    from deltalake2db_spark.plans.meta import get_meta

    t = str(tmp_path_factory.mktemp("proto") / "rw")
    df = spark.createDataFrame(
        [(i, i % 3, f"v{i}") for i in range(9)], "id long, part long, s string"
    )
    write_delta(df, t, partition_by=["part"])
    # replace only part=1 with two fresh rows
    repl = spark.createDataFrame(
        [(100, 1, "new100"), (101, 1, "new101")], "id long, part long, s string"
    )
    write_delta(
        repl, t, partition_by=["part"], mode="overwrite",
        replace_where=[("part", "=", 1)],
    )
    got = {r["id"]: r["part"] for r in scan_delta(spark, t).collect()}
    # part 0 and 2 untouched; old part=1 rows (1,4,7) gone
    assert sorted(got) == [0, 2, 3, 5, 6, 8, 100, 101]
    assert got[100] == 1 and got[101] == 1
    # history records an overwrite that removed only part=1 files
    st = get_meta(t)
    assert all("part=1" not in p or "new" not in p for p in st.add_actions)

    # incoming rows violating the condition are rejected
    bad = spark.createDataFrame([(200, 2, "x")], "id long, part long, s string")
    with pytest.raises(ValueError, match="do not satisfy"):
        write_delta(
            bad, t, partition_by=["part"], mode="overwrite",
            replace_where=[("part", "=", 1)],
        )
    # non-partition predicate rejected
    with pytest.raises(ValueError, match="partition columns only"):
        write_delta(
            repl, t, partition_by=["part"], mode="overwrite",
            replace_where=[("id", "=", 1)],
        )
    # append mode rejected
    with pytest.raises(ValueError, match="mode='overwrite'"):
        write_delta(repl, t, replace_where=[("part", "=", 1)])


def test_set_table_properties_enables_cdf(spark, tmp_path_factory):
    from deltalake2db_spark import set_table_properties, table_changes
    from deltalake2db_spark.plans.meta import get_meta

    t = str(tmp_path_factory.mktemp("proto") / "props")
    write_delta(spark.range(0, 10).selectExpr("id"), t)
    out = set_table_properties(
        spark, t, {"delta.enableChangeDataFeed": "true"}
    )
    st = get_meta(t)
    assert st.configuration["delta.enableChangeDataFeed"] == "true"
    assert st.protocol["minWriterVersion"] == 4
    # DML after enabling writes real cdc rows (changes AFTER the
    # properties commit, i.e. the delete's version)
    delete_where(spark, t, "id < 3")
    ch = table_changes(spark, t, out["version"])
    assert ch.filter("_change_type = 'delete'").count() == 3
    # unset removes the key
    set_table_properties(spark, t, {"delta.enableChangeDataFeed": None})
    assert "delta.enableChangeDataFeed" not in get_meta(t).configuration


def test_checkpoint_interval_honored(spark, tmp_path_factory):
    import os

    t = str(tmp_path_factory.mktemp("proto") / "ckpt")
    write_delta(
        spark.range(0, 2).selectExpr("id"),
        t,
        configuration={"delta.checkpointInterval": "3"},
    )
    for i in range(1, 7):
        write_delta(spark.range(i * 2, i * 2 + 2).selectExpr("id"), t)
    cps = sorted(
        f for f in os.listdir(os.path.join(t, "_delta_log"))
        if f.endswith(".checkpoint.parquet")
    )
    assert cps == [
        "00000000000000000003.checkpoint.parquet",
        "00000000000000000006.checkpoint.parquet",
    ]
    assert scan_delta(spark, t).count() == 14
