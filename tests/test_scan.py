"""End-to-end scan tests — goldens mirror the reference's
``tests/test_duckdb.py`` / ``tests/test_polars.py`` fixture expectations."""

from __future__ import annotations

import decimal
from datetime import datetime

import pytest
from pyspark.sql import types as T

from deltalake2db_spark import get_spark_schema, scan_delta, create_view_for_delta

USER_COLS = [
    "User - iD", "FirstName", "LastName", "Age", "companyid", "time stämp",
    "__timestamp", "__is_deleted", "__is_full_load",
]


def test_user_golden(spark, user_table):
    df = scan_delta(spark, user_table)
    assert df.columns == USER_COLS
    rows = sorted(df.collect(), key=lambda r: r["User - iD"])
    assert [r["FirstName"] for r in rows] == ["John", "Peter", "Petra"]
    assert rows[1]["Age"] == decimal.Decimal("23.000")
    assert rows[0]["__timestamp"] == datetime(2024, 3, 13, 13, 11, 25, 423333)
    # schema types incl. unicode name + decimal + ntz
    st = {f.name: f.dataType for f in df.schema.fields}
    assert st["Age"] == T.DecimalType(15, 3)
    assert st["time stämp"] == T.LongType()
    assert st["__timestamp"] == T.TimestampNTZType()


def test_user_filters(spark, user_table):
    df = scan_delta(spark, user_table, conditions=[("Age", "=", decimal.Decimal("23.0"))])
    rows = df.collect()
    assert len(rows) == 1 and rows[0]["FirstName"] == "Peter"

    df = scan_delta(spark, user_table,
                    conditions=[("FirstName", "in", ["Peter", "Hans-Jürg"])])
    assert df.count() == 1
    df = scan_delta(spark, user_table,
                    conditions=[("FirstName", "not in", ["Peter", "Petra"])])
    assert {r["FirstName"] for r in df.collect()} == {"John"}

    # filtered-empty result keeps identical schema
    df = scan_delta(spark, user_table, conditions=[("Age", "=", decimal.Decimal("99.0"))])
    assert df.count() == 0
    assert df.columns == USER_COLS

    # legacy dict conditions
    df = scan_delta(spark, user_table, conditions={"FirstName": "Petra"})
    assert df.count() == 1

    # select / exclude / limit / distinct
    df = scan_delta(spark, user_table, select=["FirstName", "time stämp"])
    assert df.columns == ["FirstName", "time stämp"]
    df = scan_delta(spark, user_table, exclude=["__timestamp"])
    assert "__timestamp" not in df.columns
    assert scan_delta(spark, user_table, limit=2).count() == 2
    df = scan_delta(spark, user_table, select=["companyid"], distinct=True)
    assert df.count() == 1


def test_empty_table(spark, user_empty_table):
    df = scan_delta(spark, user_empty_table)
    assert df.count() == 0
    assert df.columns == USER_COLS
    st = {f.name: f.dataType for f in df.schema.fields}
    assert st["Age"] == T.DecimalType(15, 3)


def test_view(spark, user_table):
    create_view_for_delta(spark, user_table, "user_v")
    assert spark.sql("select count(*) n from user_v").collect()[0]["n"] == 3
    with pytest.raises(ValueError):
        create_view_for_delta(spark, user_table, 'bad"name')


def test_faker2_schema_and_rows(spark, faker2_table):
    df = scan_delta(spark, faker2_table)
    assert df.columns == [
        "Super Name", "Company Very Short", "main_coord", "coords", "age", "new_name",
    ]
    st = {f.name: f.dataType for f in df.schema.fields}
    assert st["main_coord"] == T.StructType([
        T.StructField("lat", T.DoubleType()), T.StructField("lon", T.DoubleType()),
    ])
    assert isinstance(st["coords"], T.ArrayType)
    assert st["coords"].elementType.fieldNames() == ["lat", "lon"]
    rows = df.collect()
    assert len(rows) == 6
    by_company: dict = {}
    for r in rows:
        by_company.setdefault(r["Company Very Short"], []).append(r)
    assert len(by_company["BMS"]) == 4
    assert len(by_company["Other Inc"]) == 1
    assert len(by_company[None]) == 1


def test_faker2_null_struct_preserved(spark, faker2_table):
    """NULL struct must stay NULL, not become a struct of NULLs
    (reference tests/test_duckdb.py:217-239)."""
    df = scan_delta(spark, faker2_table, conditions=[("new_name", "=", "Hans Heiri")])
    rows = df.collect()
    assert len(rows) == 1
    r = rows[0]
    assert r["Super Name"] == "hans"
    assert r["main_coord"] is None
    assert r["coords"] is None
    assert r["age"] is None


def test_faker2_schema_evolution_backfill(spark, faker2_table):
    # files written before v2 lack new_name -> typed NULL backfill
    df = scan_delta(spark, faker2_table, conditions=[("Company Very Short", "=", "Other Inc")])
    rows = df.collect()
    assert rows[0]["new_name"] is None


def test_faker2_partition_pruning_matches_rows(spark, faker2_table):
    df = scan_delta(spark, faker2_table, conditions=[("Company Very Short", "=", "BMS")])
    assert df.count() == 4
    df = scan_delta(spark, faker2_table, conditions=[("Company Very Short", "=", None)])
    assert df.count() == 1


def test_faker2_time_travel(spark, faker2_table):
    df0 = scan_delta(spark, faker2_table, version=0)
    assert "new_name" not in df0.columns
    assert df0.count() == 3
    df2 = scan_delta(spark, faker2_table, version=2)
    assert "new_name" in df2.columns
    assert df2.count() == 3


def test_get_spark_schema(spark, faker2_table):
    logical = get_spark_schema(faker2_table)
    assert logical.fieldNames()[0] == "Super Name"
    physical = get_spark_schema(faker2_table, physical=True)
    assert all(n.startswith("col-") for n in physical.fieldNames())


def test_partition_values_typed(spark, partition_values_data_table):
    df = scan_delta(spark, partition_values_data_table)
    st = {f.name: f.dataType for f in df.schema.fields}
    assert st["as_int"] == T.IntegerType()
    assert st["as_date"] == T.DateType()
    assert st["as_big_decimal"] == T.DecimalType(1, 0)
    rows = {r["value"]: r for r in df.collect()}
    assert rows["0"]["as_int"] == 0 and rows["2"]["as_int"] == 1
    assert rows["1"]["as_int"] is None  # genuinely-null partition
    assert rows["0"]["as_string_lit_null"] == "null"  # literal string survives
    assert rows["0"]["as_date"].isoformat() == "2021-09-08"
    # session tz pinned to UTC => collected naive datetime IS the UTC instant
    assert rows["0"]["as_timestamp"] == datetime.fromisoformat("2021-09-08 11:11:11")
    assert rows["0"]["as_nested_struct"]["ac"]["acb"] == 0

    # pruning + row filter agree
    df = scan_delta(spark, partition_values_data_table, conditions=[("as_int", ">", 0)])
    assert df.count() == 1


def test_cluster_scan_after_checkpoint(spark, cluster_table):
    df = scan_delta(spark, cluster_table)
    assert df.count() == 14
    assert {r["Cluster Nr"] for r in df.select("`Cluster Nr`").collect()} == {
        f"N{i}" for i in range(1, 15)
    }
    nested = df.select("__metadata.inserted").first()
    assert nested[0] is not None


def test_protocol_gate(spark, user_table, tmp_path):
    import json, shutil

    bad = tmp_path / "bad_proto"
    shutil.copytree(user_table, bad)
    log = bad / "_delta_log" / "00000000000000000000.json"
    lines = log.read_text().splitlines()
    out = []
    for ln in lines:
        d = json.loads(ln)
        if "protocol" in d:
            d["protocol"]["minReaderVersion"] = 4
            d["protocol"]["readerFeatures"] = ["someFutureFeature"]
        out.append(json.dumps(d))
    log.write_text("\n".join(out))

    from deltalake2db_spark import DeltaProtocolError

    with pytest.raises(DeltaProtocolError):
        scan_delta(spark, str(bad))


def test_protocol_gate_reader_v3_dv(spark, user_table, tmp_path):
    """PROTOCOL.md requires honoring readerFeatures from reader version
    3 up (the reference bypasses <=3 — a deliberate fix).  Since this
    round deletionVectors IS a supported reader feature, a v3 table
    advertising it scans fine (files without DVs simply keep all rows);
    an unknown v3 feature still gates."""
    import json, shutil

    bad = tmp_path / "dv3"
    shutil.copytree(user_table, bad)
    log = bad / "_delta_log" / "00000000000000000000.json"
    out = []
    for ln in log.read_text().splitlines():
        d = json.loads(ln)
        if "protocol" in d:
            d["protocol"]["minReaderVersion"] = 3
            d["protocol"]["readerFeatures"] = ["deletionVectors"]
        out.append(json.dumps(d))
    log.write_text("\n".join(out))

    assert scan_delta(spark, str(bad)).count() > 0

    bad2 = tmp_path / "unknown3"
    shutil.copytree(user_table, bad2)
    log = bad2 / "_delta_log" / "00000000000000000000.json"
    out = []
    for ln in log.read_text().splitlines():
        d = json.loads(ln)
        if "protocol" in d:
            d["protocol"]["minReaderVersion"] = 3
            d["protocol"]["readerFeatures"] = ["someFutureFeature"]
        out.append(json.dumps(d))
    log.write_text("\n".join(out))

    from deltalake2db_spark import DeltaProtocolError

    with pytest.raises(DeltaProtocolError):
        scan_delta(spark, str(bad2))

    # v3 with only supported features still scans
    ok = tmp_path / "ok3"
    shutil.copytree(user_table, ok)
    log = ok / "_delta_log" / "00000000000000000000.json"
    out = []
    for ln in log.read_text().splitlines():
        d = json.loads(ln)
        if "protocol" in d:
            d["protocol"]["minReaderVersion"] = 3
            d["protocol"]["readerFeatures"] = ["timestampNtz"]
        out.append(json.dumps(d))
    log.write_text("\n".join(out))
    assert scan_delta(spark, str(ok)).count() >= 1


def test_scan_honors_dv_add_action_without_feature_flag(
    spark, user_table, tmp_path
):
    """Even when the protocol does NOT advertise deletionVectors, an add
    action carrying one is honored — deleted rows must never resurface
    (belt-and-braces: a writer that forgot the protocol upgrade still
    gets correct reads)."""
    import json, shutil

    from deltalake2db_spark.plans.deletion_vectors import inline_descriptor

    n_before = scan_delta(spark, user_table).count()
    tbl = tmp_path / "dv_add"
    shutil.copytree(user_table, tbl)
    log = tbl / "_delta_log" / "00000000000000000000.json"
    out = []
    first = True
    for ln in log.read_text().splitlines():
        d = json.loads(ln)
        if "add" in d and first:
            d["add"]["deletionVector"] = inline_descriptor([0])
            first = False
        out.append(json.dumps(d))
    log.write_text("\n".join(out))

    assert scan_delta(spark, str(tbl)).count() == n_before - 1


def test_map_column_roundtrip(spark, tmp_path):
    """Map columns read natively as MapType (the reference leaves maps
    unresolved — README.md:42 'Map yet to be done'; we deviate and
    support them, SURVEY §1.2)."""
    import pyarrow as pa

    from deltalake2db_spark.sources.delta_writer import DeltaWriter

    schema_json = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "attrs", "nullable": True, "metadata": {}, "type": {
                "type": "map", "keyType": "string", "valueType": "long",
                "valueContainsNull": True}},
        ],
    }
    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "attrs": pa.array(
            [[("a", 1), ("b", 2)], None],
            pa.map_(pa.string(), pa.int64()),
        ),
    })
    w = DeltaWriter(str(tmp_path / "m"))
    w.commit([
        w.protocol_action(1, 2),
        w.metadata_action(schema_json),
        w.add_data_file(t),
    ])
    df = scan_delta(spark, str(tmp_path / "m"))
    st = {f.name: f.dataType for f in df.schema.fields}
    assert st["attrs"] == T.MapType(T.StringType(), T.LongType())
    rows = {r["id"]: r["attrs"] for r in df.collect()}
    assert rows[1] == {"a": 1, "b": 2}
    assert rows[2] is None


def test_file_uri_unescapes_paths():
    """Add-action paths are URL-encoded once (e.g. the reference's
    data-reader-partition-values fixture stores
    'as_timestamp=2021-09-08%2011%253A11%253A11/...')."""
    from deltalake2db_spark.plans.meta import MetaState

    m = MetaState("/tbl")
    uri = m.file_uri({"path": "as_ts=2021-09-08%2011%253A11%253A11/part-0.parquet"})
    assert uri == "/tbl/as_ts=2021-09-08 11%3A11%3A11/part-0.parquet"


def test_type_widening_reads_old_files(spark, tmp_path):
    """typeWidening is in the supported readerFeatures list — a file
    written as int must read back under a widened long/double schema."""
    import pyarrow as pa

    from deltalake2db_spark.sources.delta_writer import DeltaWriter

    narrow = pa.table({
        "id": pa.array([1, 2], pa.int32()),
        "v": pa.array([1.5, 2.5], pa.float32()),
    })
    wide_schema = {
        "type": "struct",
        "fields": [
            {"name": "id", "type": "long", "nullable": True, "metadata": {}},
            {"name": "v", "type": "double", "nullable": True, "metadata": {}},
        ],
    }
    w = DeltaWriter(str(tmp_path / "t"))
    w.commit([
        w.protocol_action(3, 7, reader_features=["typeWidening"],
                          writer_features=["typeWidening"]),
        w.metadata_action(wide_schema),
        w.add_data_file(narrow),
    ])
    df = scan_delta(spark, str(tmp_path / "t"))
    st = {f.name: f.dataType for f in df.schema.fields}
    assert st["id"] == T.LongType() and st["v"] == T.DoubleType()
    rows = sorted(df.collect(), key=lambda r: r["id"])
    assert rows[0]["id"] == 1 and abs(rows[0]["v"] - 1.5) < 1e-9


def test_many_partitions_filejoin_strategy(spark, tmp_path):
    """Above JOIN_STRATEGY_THRESHOLD distinct partition tuples the scan
    switches to the input_file_name broadcast-join plan (O(1) plan size
    in file count) — values must be identical to the literal strategy."""
    from pyspark.sql import functions as F

    from deltalake2db_spark.sources import delta as delta_mod
    from deltalake2db_spark.sources.delta_sink import write_delta

    path = str(tmp_path / "many")
    src = spark.range(0, 1000).select(
        F.col("id"), (F.col("id") % 100).cast("string").alias("pk")
    )
    write_delta(src, path, partition_by=["pk"])

    df = scan_delta(spark, path)
    assert df.count() == 1000
    assert df.select("pk").distinct().count() == 100
    got = {r["id"]: r["pk"] for r in df.collect()}
    assert got[123] == str(123 % 100)

    # sanity: this really took the join path (threshold is 64)
    assert delta_mod.JOIN_STRATEGY_THRESHOLD < 100

    # conditions still prune + filter correctly through the join plan
    sub = scan_delta(spark, path, conditions=[("pk", "=", "7")])
    assert sub.count() == 10
    assert {r["id"] % 100 for r in sub.collect()} == {7}


def test_compacted_log_files_ignored(spark, user_table, tmp_path):
    """Engines write *.compacted.json / CRC files into _delta_log; only
    canonical %020d.json commits participate in replay (the reference's
    cluster fixture carries compacted ranges for the same reason)."""
    import shutil

    t = tmp_path / "t"
    shutil.copytree(user_table, t)
    log = t / "_delta_log"
    (log / "00000000000000000000.00000000000000000005.compacted.json").write_text(
        '{"add": {"path": "bogus.parquet", "partitionValues": {}}}\n'
    )
    (log / "00000000000000000000.crc").write_text("{}")
    df = scan_delta(spark, str(t))
    assert df.count() == 3
