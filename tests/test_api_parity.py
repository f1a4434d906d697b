"""API-parity surface tests: SQL-string sink, escape hatch, metadata IO."""

from __future__ import annotations

import pytest

from deltalake2db_spark.plans.meta import MetadataIO, get_meta
from deltalake2db_spark.sources.delta import get_sql_for_delta, scan_delta_native


def test_get_sql_for_delta(spark, user_table):
    sql = get_sql_for_delta(spark, user_table)
    assert sql == "SELECT * FROM `deltalake2db_delta_table`"
    assert spark.sql(f"SELECT count(*) AS n FROM ({sql})").collect()[0]["n"] == 3

    cte = get_sql_for_delta(spark, user_table, cte_wrap_name="users")
    assert cte.startswith("WITH `users` AS")
    full = f"{cte} SELECT FirstName FROM `users` WHERE Age > 20 ORDER BY FirstName"
    assert [r[0] for r in spark.sql(full).collect()] == ["Peter", "Petra"]


def test_scan_delta_native_raises_without_connector(spark, user_table):
    with pytest.raises(RuntimeError, match="delta-spark"):
        scan_delta_native(spark, user_table).collect()


def test_metadata_io_helpers(user_table):
    io = MetadataIO()
    files = io.list_files(user_table)
    assert any(f.endswith(".parquet") for f in files)
    assert any(f.endswith("_delta_log") for f in files)

    m = get_meta(user_table)
    data_files = [m.file_uri(a) for a in m.add_actions.values()]
    names = io.parquet_schema_names(data_files[0])
    assert "FirstName" in names

    probed = m.probe_file_columns(data_files)
    assert set(probed) == set(data_files)
    assert "time stämp" in probed[data_files[0]]


def test_action_filter(spark, faker2_table):
    from deltalake2db_spark import scan_delta

    # F9: user callback filtering add-actions (here: only NULL-partition file)
    df = scan_delta(
        spark, faker2_table,
        action_filter=lambda a: a.get("partitionValues", {}).get("col-02") is None,
    )
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["Super Name"] == "hans"
