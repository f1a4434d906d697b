"""table_changes: log-derived row-level change feed (sources/changes.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deltalake2db_spark.sources.changes import table_changes
from deltalake2db_spark.sources.delta_sink import delete_where, write_delta
from deltalake2db_spark.sources.maintenance import optimize, update_where


@pytest.fixture(scope="module")
def changed_table(spark, tmp_path_factory):
    t = str(tmp_path_factory.mktemp("chg") / "t")
    df = spark.range(0, 100).selectExpr("id", "cast(id as double) as v")
    write_delta(df.repartition(2), t)  # v0
    write_delta(
        spark.range(100, 110).selectExpr("id", "cast(id as double) as v"), t
    )  # v1 append
    delete_where(spark, t, "id in (3, 4)")  # v2 DV deletes
    update_where(spark, t, "id = 50", {"v": "-1"})  # v3 rewrite
    optimize(spark, t)  # v4 dataChange=false
    return t


def test_change_counts_by_version(spark, changed_table):
    got = {
        (r["_commit_version"], r["_change_type"]): r["n"]
        for r in table_changes(spark, changed_table, 0)
        .groupBy("_commit_version", "_change_type")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got[(1, "insert")] == 10
    assert got[(2, "delete")] == 2
    # the rewrite surfaces as delete+insert of the rewritten file
    assert got[(3, "delete")] == got[(3, "insert")]
    # optimize (v4) contributes nothing
    assert not any(v == 4 for v, _ in got)


def test_dv_deletes_are_exact_rows(spark, changed_table):
    deleted = [
        r["id"]
        for r in table_changes(spark, changed_table, 1, 2)
        .orderBy("id")
        .collect()
    ]
    assert deleted == [3, 4]


def test_update_postimage_present(spark, changed_table):
    v3 = table_changes(spark, changed_table, 2, 3)
    post = v3.filter("_change_type = 'insert' and id = 50").collect()[0]
    pre = v3.filter("_change_type = 'delete' and id = 50").collect()[0]
    assert post["v"] == -1.0 and pre["v"] == 50.0


def test_empty_range_and_bad_version(spark, changed_table):
    empty = table_changes(spark, changed_table, 4)
    assert empty.count() == 0
    assert "_change_type" in empty.columns
    with pytest.raises(ValueError, match="does not exist"):
        table_changes(spark, changed_table, 4, 99)


def test_overwrite_boundary_derives_delete_plus_insert(spark, tmp_path_factory):
    """A mode='overwrite' write_delta commit carries no cdc actions even
    on a CDF-enabled table (delta-spark emits none for overwrite
    either); table_changes must DERIVE the change set from the commit's
    remove+add actions — every previously-live row a delete, every new
    row an insert, in the overwrite's version (VERDICT r4 #7)."""
    from deltalake2db_spark.sources.delta_sink import delete_where, write_delta

    t = str(tmp_path_factory.mktemp("cdfov") / "t")
    write_delta(
        spark.range(0, 10).selectExpr("id"),
        t,
        configuration={"delta.enableChangeDataFeed": "true"},
    )                                                      # v0
    delete_where(spark, t, "id = 3")                       # v1: true cdc
    write_delta(
        spark.range(100, 105).selectExpr("id"), t, mode="overwrite"
    )                                                      # v2: no cdc
    got = {
        (r["_commit_version"], r["_change_type"], r["id"])
        for r in table_changes(spark, t, 0).collect()
    }
    expect = {(1, "delete", 3)}
    # overwrite boundary: the 9 rows still live after v1 die, 5 arrive
    expect |= {(2, "delete", i) for i in range(10) if i != 3}
    expect |= {(2, "insert", i) for i in range(100, 105)}
    assert got == expect


def test_table_changes_timestamp_bounds(spark, tmp_path_factory):
    """Timestamp bounds resolve like delta-spark CDF options: starting
    includes the first commit at-or-after, ending the last commit
    at-or-before (writer commit times: 1700000000000ms + version)."""
    import pytest

    t = str(tmp_path_factory.mktemp("chts") / "t")
    for i in range(4):  # versions 0..3
        write_delta(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id"),
            t,
            mode="error" if i == 0 else "append",
        )
    base = 1700000000000 / 1000.0
    # from commit 1 (inclusive) through commit 2 (inclusive)
    ch = table_changes(
        spark, t,
        starting_timestamp=base + 0.001, ending_timestamp=base + 0.002,
    )
    ids = sorted(r["id"] for r in ch.collect())
    assert ids == list(range(10, 30))
    assert set(r["_change_type"] for r in ch.collect()) == {"insert"}
    with pytest.raises(ValueError, match="mutually exclusive"):
        table_changes(spark, t, 0, starting_timestamp=base)
    with pytest.raises(ValueError, match="required"):
        table_changes(spark, t)
    # starting_timestamp at (or before) the FIRST commit includes the
    # feed from version 0 — delta-spark starts at the earliest version
    # instead of erroring on the absent version -1 snapshot
    ch0 = table_changes(spark, t, starting_timestamp=base)
    assert sorted(r["id"] for r in ch0.collect()) == list(range(40))
    ch0 = table_changes(spark, t, starting_timestamp=base - 3600.0)
    assert ch0.count() == 40
    # ending_timestamp past the last commit clamps to latest (CDF
    # semantics) rather than raising like timestampAsOf
    ch = table_changes(
        spark, t, starting_timestamp=base, ending_timestamp=base + 999
    )
    assert ch.count() == 40
