"""Change Data Feed (sources/cdc.py): DML on a
``delta.enableChangeDataFeed=true`` table writes ``_change_data/``
parquet + ``cdc`` actions, and ``table_changes`` reads those INSTEAD of
deriving changes from add/remove (PROTOCOL.md "Add CDC File").
"""

from __future__ import annotations

import json
import os

import pytest
from pyspark.sql import functions as F

from deltalake2db_spark.plans.meta import get_meta
from deltalake2db_spark.sources.changes import table_changes
from deltalake2db_spark.sources.delta_sink import delete_where, write_delta
from deltalake2db_spark.sources.maintenance import merge_into, update_where

CDF = {"delta.enableChangeDataFeed": "true"}


@pytest.fixture(scope="module")
def cdf_table(spark, tmp_path_factory):
    t = str(tmp_path_factory.mktemp("cdf") / "t")
    df = spark.range(0, 100).selectExpr(
        "id", "cast(id as double) as v", "cast(id % 2 as int) as part"
    )
    write_delta(df.repartition(2), t, partition_by=["part"],
                configuration=CDF)                       # v0 CREATE
    update_where(spark, t, "id in (10, 11)", {"v": "v * -1"})  # v1 UPDATE
    delete_where(spark, t, "id in (3, 4)")               # v2 DELETE (DV)
    src = spark.range(95, 105).selectExpr(
        "id", "cast(-id as double) as v", "cast(id % 2 as int) as part"
    )
    merge_into(spark, t, src, on=["id"])                 # v3 MERGE upsert
    return t


def _commit_actions(path, v):
    with open(os.path.join(path, "_delta_log", f"{v:020d}.json")) as fh:
        return [json.loads(line) for line in fh if line.strip()]


def test_dml_commits_carry_cdc_actions(cdf_table):
    for v, op in [(1, "UPDATE"), (2, "DELETE"), (3, "MERGE")]:
        acts = _commit_actions(cdf_table, v)
        cdcs = [a["cdc"] for a in acts if a.get("cdc")]
        assert cdcs, f"commit v{v} ({op}) has no cdc actions"
        for c in cdcs:
            assert c["path"].startswith("_change_data/")
            assert c["dataChange"] is False
            assert os.path.exists(os.path.join(cdf_table, c["path"]))
            # CDC partitionValues mirror data-file partitionValues
            assert set(c["partitionValues"]) == {"part"}


def test_update_produces_pre_and_postimages(spark, cdf_table):
    ch = table_changes(spark, cdf_table, 0, 1)
    rows = {
        (r["id"], r["_change_type"]): r["v"] for r in ch.collect()
    }
    assert rows[(10, "update_preimage")] == 10.0
    assert rows[(10, "update_postimage")] == -10.0
    assert rows[(11, "update_preimage")] == 11.0
    assert rows[(11, "update_postimage")] == -11.0
    assert len(rows) == 4  # nothing but the two updated rows


def test_delete_emits_cdc_delete_rows(spark, cdf_table):
    ch = table_changes(spark, cdf_table, 1, 2)
    got = sorted((r["id"], r["_change_type"]) for r in ch.collect())
    assert got == [(3, "delete"), (4, "delete")]


def test_merge_emits_update_and_insert_changes(spark, cdf_table):
    ch = table_changes(spark, cdf_table, 2, 3)
    by_type = {
        r["_change_type"]: r["n"]
        for r in ch.groupBy("_change_type").agg(F.count("*").alias("n")).collect()
    }
    # ids 95..99 matched (update), 100..104 inserted
    assert by_type["update_preimage"] == 5
    assert by_type["update_postimage"] == 5
    assert by_type["insert"] == 5
    inserted = {
        r["id"] for r in ch.filter(F.col("_change_type") == "insert").collect()
    }
    assert inserted == {100, 101, 102, 103, 104}
    # partition column restored from partitionValues on every cdc row
    assert ch.filter(F.col("part").isNull()).count() == 0
    assert (
        ch.filter(
            F.col("part") != (F.col("id") % 2).cast("int")
        ).count()
        == 0
    )


def test_full_feed_spans_cdc_commits(spark, cdf_table):
    # one feed over all three DML commits (changes AFTER v0): every
    # commit version present, all change types cdc-sourced
    ch = table_changes(spark, cdf_table, 0)
    versions = {
        r["_commit_version"]
        for r in ch.select("_commit_version").distinct().collect()
    }
    assert versions == {1, 2, 3}
    assert ch.count() == 4 + 2 + 15


def test_final_state_consistent_with_changes(spark, cdf_table):
    from deltalake2db_spark import scan_delta

    # replay the feed by key on top of v0 and compare with the live scan
    live = {
        (r["id"]): r["v"] for r in scan_delta(spark, cdf_table).collect()
    }
    assert live[10] == -10.0 and live[11] == -11.0
    assert 3 not in live and 4 not in live
    assert live[100] == -100.0
    assert len(live) == 103  # 100 - 2 deleted + 5 inserted


def test_cdf_enabled_gate(cdf_table):
    from deltalake2db_spark.sources.cdc import cdf_enabled

    assert cdf_enabled(get_meta(cdf_table))


def test_vacuum_protects_cdc_files(cdf_table):
    from deltalake2db_spark.sources.delta_sink import vacuum

    # age nothing: retention 0 makes every unreferenced parquet an
    # orphan candidate — cdc files must still be protected
    orphans = vacuum(cdf_table, dry_run=True, retention_hours=0.0)
    assert not any(o.startswith("_change_data/") for o in orphans), orphans


def test_cdf_survives_checkpoint_bootstrap(spark, cdf_table):
    """Checkpoint parquet stores the configuration MAP as entry
    structs; a snapshot bootstrapped from it must still expose a dict
    (cdf_enabled crashed on the entries-list before) and later DML
    must keep writing cdc actions."""
    from deltalake2db_spark.sources.cdc import cdf_enabled
    from deltalake2db_spark.sources.delta_sink import write_checkpoint

    write_checkpoint(cdf_table)
    m = get_meta(cdf_table)
    assert isinstance(
        (m.last_metadata or {}).get("configuration"), dict
    )
    assert cdf_enabled(m)
    v = update_where(spark, cdf_table, "id = 20", {"v": "-20"})["version"]
    acts = _commit_actions(cdf_table, v)
    assert [a for a in acts if a.get("cdc")], "post-checkpoint DML lost CDC"


def test_cdf_on_column_mapped_table(spark, tmp_path_factory):
    """CDC files store PHYSICAL column names on mapped tables and
    exclude partition columns; the feed must restore logical names and
    partition values exactly."""
    from fixture_tables import build_faker2

    from deltalake2db_spark.sources.delta_writer import DeltaWriter

    p = build_faker2(str(tmp_path_factory.mktemp("mapped_cdf") / "t"))
    m = get_meta(p)
    cfg = dict((m.last_metadata or {}).get("configuration", {}))
    assert cfg.get("delta.columnMapping.mode") == "name"
    w = DeltaWriter(p)
    w.version = m.version
    md = dict(m.last_metadata)
    md["configuration"] = {**cfg, "delta.enableChangeDataFeed": "true"}
    w.commit([{"metaData": md}], operation="SET TBLPROPERTIES")

    rep = update_where(
        spark, p, "`Super Name` = 'Name 1'", {"age": "array(98, 99)"}
    )
    ch = table_changes(spark, p, rep["version"] - 1, rep["version"])
    rows = {
        r["_change_type"]: (r["Super Name"], r["Company Very Short"], r["age"])
        for r in ch.collect()
    }
    assert rows["update_preimage"] == ("Name 1", "BMS", [1, 2])
    assert rows["update_postimage"] == ("Name 1", "BMS", [98, 99])


@pytest.mark.parametrize("seed", [0, 1, 2])
def test_feed_replay_reconstructs_final_state(spark, tmp_path_factory, seed):
    """Property: applying the change feed over the initial snapshot by
    key reproduces the final table exactly, for a randomized DML
    sequence (appends, updates, DV deletes, merges)."""
    import random

    rnd = random.Random(seed)
    t = str(tmp_path_factory.mktemp(f"cdf_prop{seed}") / "t")
    write_delta(
        spark.range(0, 40).selectExpr("id", "cast(id as double) as v"),
        t, configuration=CDF,
    )
    next_id = 40
    for _ in range(4):
        op = rnd.choice(["append", "update", "delete", "merge"])
        if op == "append":
            write_delta(
                spark.range(next_id, next_id + 10).selectExpr(
                    "id", "cast(id as double) as v"
                ),
                t,
            )
            next_id += 10
        elif op == "update":
            k = rnd.randrange(0, next_id)
            update_where(spark, t, f"id % 7 = {k % 7}", {"v": "v + 1000"})
        elif op == "delete":
            k = rnd.randrange(0, 7)
            delete_where(spark, t, f"id % 11 = {k}")
        else:
            src = spark.range(next_id - 5, next_id + 5).selectExpr(
                "id", "cast(-1 as double) as v"
            )
            merge_into(spark, t, src, on=["id"])
            next_id += 5

    from deltalake2db_spark import scan_delta

    base = {
        r["id"]: r["v"]
        for r in scan_delta(spark, get_meta(t, version=0)).collect()
    }
    feed = sorted(
        table_changes(spark, t, 0).collect(),
        key=lambda r: (r["_commit_version"],),
    )
    state = dict(base)
    for r in feed:
        ct = r["_change_type"]
        if ct in ("insert", "update_postimage"):
            state[r["id"]] = r["v"]
        elif ct == "delete":
            state.pop(r["id"], None)
        # update_preimage: no state transition
    final = {r["id"]: r["v"] for r in scan_delta(spark, t).collect()}
    assert state == final


def test_feed_spans_schema_evolution(spark, tmp_path_factory):
    """cdc rows written before an ADD COLUMN backfill it as typed
    NULLs; the whole feed resolves against the end-version schema
    (crashed with NUM_COLUMNS_MISMATCH before)."""
    import json as _json

    from deltalake2db_spark.sources.delta_writer import DeltaWriter

    t = str(tmp_path_factory.mktemp("cdf_evo") / "t")
    write_delta(
        spark.range(0, 20).selectExpr("id", "cast(id as double) as v"),
        t, configuration=CDF,
    )                                                         # v0
    update_where(spark, t, "id = 1", {"v": "-1"})             # v1 old schema
    m = get_meta(t)
    md = dict(m.last_metadata)
    sch = _json.loads(md["schemaString"])
    sch["fields"].append(
        {"name": "tag", "type": "string", "nullable": True, "metadata": {}}
    )
    md["schemaString"] = _json.dumps(sch)
    w = DeltaWriter(t)
    w.version = m.version
    w.commit([{"metaData": md}], operation="ADD COLUMN")      # v2
    write_delta(
        spark.range(20, 25).selectExpr(
            "id", "cast(id as double) as v", "'x' as tag"
        ),
        t,
    )                                                         # v3
    update_where(spark, t, "id = 21", {"v": "-21"})           # v4 new schema

    ch = table_changes(spark, t, 0)
    assert set(ch.columns) == {"id", "v", "tag", "_change_type",
                               "_commit_version"}
    rows = {
        (r["_commit_version"], r["id"], r["_change_type"]): r["tag"]
        for r in ch.collect()
    }
    assert rows[(1, 1, "update_preimage")] is None   # pre-evolution cdc
    assert rows[(4, 21, "update_postimage")] == "x"  # post-evolution cdc
    assert rows[(3, 22, "insert")] == "x"            # derived insert


def test_cdc_reader_filejoin_above_group_threshold(spark, tmp_path_factory):
    """Above 64 partition groups the cdc reader switches to one
    multi-path scan + broadcast partition-value join; both paths must
    agree and the plan must not grow with group count."""
    from deltalake2db_spark.sources.cdc import (
        _read_cdc_filejoin,
        read_cdc_actions,
        write_cdc_partitioned,
    )
    from deltalake2db_spark.sources.delta_sink import write_delta

    t = str(tmp_path_factory.mktemp("cdc_many") / "t")
    n_parts = 70
    df = spark.range(0, 2 * n_parts).selectExpr(
        "id", f"cast(id % {n_parts} as int) as part",
        "cast(id as double) as v",
    )
    write_delta(df, t, partition_by=["part"], configuration=CDF)
    m = get_meta(t)
    changes = df.withColumn("_change_type", F.lit("insert"))
    actions = [a["cdc"] for a in write_cdc_partitioned(changes, m, t)]
    assert len({json.dumps(a["partitionValues"]) for a in actions}) == n_parts

    fast = _read_cdc_filejoin(spark, m, t, actions)
    assert fast._jdf.queryExecution().executedPlan().toString().count(
        "Scan parquet"
    ) == 1
    got = read_cdc_actions(spark, m, t, actions)  # takes filejoin branch
    expect = {(r["id"], r["part"], r["v"]) for r in df.collect()}
    for frame in (fast, got):
        rows = {(r["id"], r["part"], r["v"]) for r in frame.collect()}
        assert rows == expect
        assert frame.filter(F.col("_change_type") != "insert").count() == 0


def test_merge_matched_delete_emits_cdc_deletes(spark, tmp_path_factory):
    """merge_into(when_matched_delete=True) on a CDF table records the
    matched rows as cdc 'delete' changes (branch untested elsewhere)."""
    t = str(tmp_path_factory.mktemp("cdf_mdel") / "t")
    write_delta(
        spark.range(0, 30).selectExpr("id", "cast(id as double) as v"),
        t, configuration=CDF,
    )
    src = spark.range(5, 8).selectExpr("id")
    rep = merge_into(
        spark, t, src, on=["id"],
        when_matched_delete=True, when_not_matched_insert=False,
    )
    ch = table_changes(spark, t, rep["version"] - 1, rep["version"])
    got = sorted((r["id"], r["_change_type"]) for r in ch.collect())
    assert got == [(5, "delete"), (6, "delete"), (7, "delete")]
    from deltalake2db_spark import scan_delta

    assert scan_delta(spark, t).count() == 27
