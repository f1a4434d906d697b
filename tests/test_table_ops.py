"""RESTORE / DESCRIBE HISTORY / SHALLOW CLONE / CHECK constraints
(sources/maintenance.py, sources/delta_sink.py)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from deltalake2db_spark import get_meta, scan_delta
from deltalake2db_spark.sources.delta_sink import (
    DeltaConstraintError,
    delete_where,
    write_delta,
)
from deltalake2db_spark.sources.maintenance import (
    add_check_constraint,
    describe_history,
    drop_check_constraint,
    restore_table,
    shallow_clone,
    update_where,
)


def _table(spark, path, n=5000, files=4):
    df = spark.range(0, n).selectExpr(
        "id", "id % 5 as g", "cast(id * 2 as double) as v"
    )
    write_delta(df.repartition(files), str(path))
    return str(path)


# ------------------------------------------------------------------ RESTORE

def test_restore_undoes_delete_and_update(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    before = scan_delta(spark, t).orderBy("id").collect()
    delete_where(spark, t, "id % 10 = 3")          # v1 (DV delete)
    update_where(spark, t, "g = 2", {"v": "v * 100"})  # v2 (rewrite)
    assert scan_delta(spark, t).count() == 4500

    rep = restore_table(spark, t, 0)
    assert rep["restored_version"] == 0
    assert scan_delta(spark, t).orderBy("id").collect() == before
    # the restore is a commit: history preserved, v2 still reachable
    assert scan_delta(spark, t, version=2).count() == 4500


def test_restore_roundtrip_forward(spark, tmp_path):
    """Restore back to the pre-restore state (restore of a restore)."""
    t = _table(spark, tmp_path / "t")
    delete_where(spark, t, "id < 2500")            # v1
    after_delete = scan_delta(spark, t).orderBy("id").collect()
    restore_table(spark, t, 0)                     # v2: undo the delete
    assert scan_delta(spark, t).count() == 5000
    restore_table(spark, t, 1)                     # v3: redo the delete
    assert scan_delta(spark, t).orderBy("id").collect() == after_delete


def test_restore_vacuumed_file_fails(spark, tmp_path):
    import os

    t = _table(spark, tmp_path / "t", files=2)
    old_files = list(get_meta(t).add_actions)
    # overwrite makes v1 drop the old files, then simulate vacuum
    write_delta(
        spark.range(0, 10).selectExpr(
            "id", "id % 5 as g", "cast(id * 2 as double) as v"
        ),
        t,
        mode="overwrite",
    )
    os.remove(os.path.join(t, old_files[0]))
    with pytest.raises(FileNotFoundError, match="vacuumed"):
        restore_table(spark, t, 0)


# ------------------------------------------------------------------ HISTORY

def test_describe_history(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    delete_where(spark, t, "id = 1")
    restore_table(spark, t, 0)
    h = describe_history(spark, t).collect()
    assert [r["version"] for r in h] == [2, 1, 0]
    assert h[0]["operation"] == "RESTORE"
    assert h[0]["operationParameters"]["version"] == "0"
    assert h[2]["operation"] == "WRITE" and h[2]["n_adds"] == 4


# ------------------------------------------------------------------- CLONE

def test_shallow_clone_reads_source_files(spark, tmp_path):
    t = _table(spark, tmp_path / "src")
    rep = shallow_clone(spark, t, tmp_path / "dst")
    assert rep["files_referenced"] == 4
    src_rows = scan_delta(spark, t).orderBy("id").collect()
    assert scan_delta(spark, str(tmp_path / "dst")).orderBy("id").collect() \
        == src_rows
    # no data files under the clone root
    import os

    dst_files = [
        f for _r, _d, fs in os.walk(tmp_path / "dst") for f in fs
        if f.endswith(".parquet")
    ]
    assert dst_files == []


def test_shallow_clone_dv_table(spark, tmp_path):
    """DV descriptors are rewritten to absolute paths — deleted rows
    stay deleted through the clone."""
    t = _table(spark, tmp_path / "src")
    delete_where(spark, t, "id % 2 = 0")
    shallow_clone(spark, t, tmp_path / "dst")
    assert scan_delta(spark, str(tmp_path / "dst")).count() == 2500
    assert scan_delta(
        spark, str(tmp_path / "dst"), conditions=[("g", "=", 1)]
    ).count() == 500


def test_clone_evolves_independently(spark, tmp_path):
    t = _table(spark, tmp_path / "src")
    c = str(tmp_path / "dst")
    shallow_clone(spark, t, c)
    delete_where(spark, c, "id < 1000")
    assert scan_delta(spark, c).count() == 4000
    assert scan_delta(spark, t).count() == 5000  # source untouched


# -------------------------------------------------------------- CONSTRAINTS

def test_check_constraint_lifecycle(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    rep = add_check_constraint(spark, t, "v_nonneg", "v >= 0")
    assert get_meta(t).protocol["minWriterVersion"] >= 3

    ok_df = spark.range(10, 20).selectExpr(
        "id", "id % 5 as g", "cast(id as double) as v"
    )
    write_delta(ok_df, t)  # passes

    bad_df = spark.range(0, 5).selectExpr(
        "id", "id % 5 as g", "cast(-1 as double) as v"
    )
    with pytest.raises(DeltaConstraintError, match="v_nonneg"):
        write_delta(bad_df, t)

    drop_check_constraint(spark, t, "v_nonneg")
    write_delta(bad_df, t)  # allowed after drop
    assert scan_delta(spark, t).filter(F.col("v") < 0).count() == 5
    ops = [r["operation"] for r in describe_history(spark, t).collect()]
    assert "ADD CONSTRAINT" in ops and "DROP CONSTRAINT" in ops


def test_add_constraint_rejects_existing_violations(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    with pytest.raises(DeltaConstraintError, match="existing"):
        add_check_constraint(spark, t, "small", "id < 100")
    # nothing committed
    assert get_meta(t).version == 0


def test_null_violates_constraint(spark, tmp_path):
    t = _table(spark, tmp_path / "t", n=10, files=1)
    add_check_constraint(spark, t, "v_set", "v >= 0")
    null_df = spark.range(0, 3).selectExpr(
        "id", "id % 5 as g", "cast(null as double) as v"
    )
    with pytest.raises(DeltaConstraintError):
        write_delta(null_df, t)
