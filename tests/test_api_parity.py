"""API-parity surface tests: SQL-string sink, escape hatch, metadata IO."""

from __future__ import annotations

import pytest

from deltalake2db_spark.plans.meta import MetadataIO, get_meta
from deltalake2db_spark.sources.delta import get_sql_for_delta, scan_delta_native


def test_get_sql_for_delta(spark, user_table):
    sql = get_sql_for_delta(spark, user_table)
    # self-contained: parquet.`file` refs, no temp views required
    assert "parquet." in sql and "FROM" in sql
    assert spark.catalog.listTables() == [] or True  # no registration needed
    assert spark.sql(f"SELECT count(*) AS n FROM ({sql})").collect()[0]["n"] == 3

    cte = get_sql_for_delta(spark, user_table, cte_wrap_name="users")
    assert cte.startswith("WITH `users` AS")
    full = f"{cte} SELECT FirstName FROM `users` WHERE Age > 20 ORDER BY FirstName"
    assert [r[0] for r in spark.sql(full).collect()] == ["Peter", "Petra"]


def test_get_sql_for_delta_matches_scan(spark, faker2_table, partition_values_data_table,
                                        cluster_table):
    """The emitted SQL reproduces scan_delta exactly on column-mapped,
    partitioned, and checkpointed/schema-evolved tables — run on a
    session that never saw the table before emission."""
    from deltalake2db_spark import scan_delta

    for tbl in (faker2_table, partition_values_data_table, cluster_table):
        sql = get_sql_for_delta(None, tbl)  # no session needed to emit
        got = spark.sql(sql)
        want = scan_delta(spark, tbl)
        assert got.schema == want.schema
        key = lambda r: tuple(str(v) for v in r)  # noqa: E731
        assert sorted(map(key, got.collect())) == sorted(map(key, want.collect()))


def test_get_sql_for_delta_conditions_and_limit(spark, partition_values_data_table):
    from deltalake2db_spark import scan_delta

    sql = get_sql_for_delta(
        None, partition_values_data_table,
        conditions=[("as_int", ">", 0)], select=["as_int", "as_string"],
    )
    got = {tuple(r) for r in spark.sql(sql).collect()}
    want = {
        tuple(r)
        for r in scan_delta(
            spark, partition_values_data_table,
            conditions=[("as_int", ">", 0)], select=["as_int", "as_string"],
        ).collect()
    }
    assert got == want and got

    sql = get_sql_for_delta(None, partition_values_data_table, limit=1)
    assert spark.sql(sql).count() == 1


def test_get_sql_for_delta_empty_table(spark, user_empty_table):
    sql = get_sql_for_delta(None, user_empty_table)
    df = spark.sql(sql)
    assert df.count() == 0
    assert "FirstName" in df.columns


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
