"""OPTIMIZE / Z-ORDER / DV purge (sources/maintenance.py)."""

from __future__ import annotations

from pyspark.sql import functions as F

from deltalake2db_spark import get_meta, scan_delta
from deltalake2db_spark.sources.delta_sink import delete_where, write_delta
from deltalake2db_spark.sources.maintenance import optimize


def _table(spark, path, n=20000, files=8, partition_by=()):
    df = spark.range(0, n).selectExpr(
        "id",
        "id % 3 as g",
        "cast(rand(1) * 10000 as long) as x",
        "cast(rand(2) * 10000 as long) as y",
    )
    write_delta(df.repartition(files), str(path), partition_by=partition_by)
    return str(path)


def test_compaction_preserves_data(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    before = scan_delta(spark, t).orderBy("id").collect()
    rep = optimize(spark, t)
    assert rep["files_removed"] == 8 and rep["files_added"] == 1
    assert len(get_meta(t).add_actions) == 1
    assert scan_delta(spark, t).orderBy("id").collect() == before
    # dataChange=false everywhere in the optimize commit
    import json

    log = f"{t}/_delta_log/{rep['version']:020d}.json"
    for line in open(log):
        d = json.loads(line)
        for kind in ("add", "remove"):
            if kind in d:
                assert d[kind]["dataChange"] is False
    # pre-optimize version still scans the old files
    assert scan_delta(spark, t, version=0).count() == 20000


def test_partitioned_compaction(spark, tmp_path):
    t = _table(spark, tmp_path / "t", files=6, partition_by=("g",))
    rep = optimize(spark, t)
    assert rep["groups"] == 3
    assert len(get_meta(t).add_actions) == 3
    got = {
        (r["g"], r["n"])
        for r in scan_delta(spark, t)
        .groupBy("g")
        .agg(F.count("*").alias("n"))
        .collect()
    }
    assert got == {(0, 6667), (1, 6667), (2, 6666)}


def test_optimize_purges_deletion_vectors(spark, tmp_path):
    t = _table(spark, tmp_path / "t")
    delete_where(spark, t, "id < 500")
    rep = optimize(spark, t)
    assert rep["version"] is not None
    state = get_meta(t)
    assert not any(a.get("deletionVector") for a in state.add_actions.values())
    assert scan_delta(spark, t).count() == 19500


def test_noop_when_already_compact(spark, tmp_path):
    t = _table(spark, tmp_path / "t", files=1)
    rep = optimize(spark, t)
    assert rep["version"] is None and rep["files_removed"] == 0


def test_zorder_improves_pruning(spark, tmp_path):
    t = _table(spark, tmp_path / "t", n=200000, files=16)
    conds = [("x", ">=", 100), ("x", "<", 300)]
    state = get_meta(t)
    assert len(list(state.get_add_actions_filtered(conds))) == 16
    optimize(spark, t, target_file_size=200_000, zorder_by=["x", "y"])
    state2 = get_meta(t)
    total = len(state2.add_actions)
    survive_x = len(list(state2.get_add_actions_filtered(conds)))
    survive_y = len(
        list(
            state2.get_add_actions_filtered(
                [("y", ">=", 100), ("y", "<", 300)]
            )
        )
    )
    # both interleaved dimensions must prune meaningfully
    assert survive_x <= total // 2, (survive_x, total)
    assert survive_y <= total // 2, (survive_y, total)
    assert scan_delta(spark, t).count() == 200000


def test_update_where_rewrites_only_hit_files(spark, tmp_path):
    from deltalake2db_spark.sources.maintenance import update_where

    t = str(tmp_path / "t")
    df = spark.range(0, 1000).selectExpr(
        "id", "id % 4 as g", "cast(id as double) as price"
    )
    write_delta(df.repartition(4), t, partition_by=("g",))
    n_files = len(get_meta(t).add_actions)
    rep = update_where(spark, t, "g = 2 and id = 50", {"price": "price * 2"})
    # only files containing id=50 (one file) rewritten, not all 16
    assert rep["updated_files"] < n_files
    out = scan_delta(spark, t)
    assert out.filter("id = 50").collect()[0]["price"] == 100.0
    assert out.filter("id = 54").collect()[0]["price"] == 54.0
    assert out.count() == 1000
    # pre-update version unchanged
    assert (
        scan_delta(spark, t, version=0).filter("id = 50").collect()[0]["price"]
        == 50.0
    )


def test_update_where_simultaneous_assignment(spark, tmp_path):
    from deltalake2db_spark.sources.maintenance import update_where

    t = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr(
        "id", "cast(id as double) as a", "cast(id * 10 as double) as b"
    )
    write_delta(df, t)
    update_where(spark, t, "id = 3", {"a": "b", "b": "a"})
    r = scan_delta(spark, t).filter("id = 3").collect()[0]
    assert (r["a"], r["b"]) == (30.0, 3.0)  # swapped, not chained


def test_update_where_rejects_partition_and_unknown_cols(spark, tmp_path):
    import pytest

    from deltalake2db_spark.sources.maintenance import update_where

    t = str(tmp_path / "t")
    df = spark.range(0, 10).selectExpr("id", "id % 2 as g")
    write_delta(df, t, partition_by=("g",))
    with pytest.raises(ValueError, match="partition columns"):
        update_where(spark, t, "id = 1", {"g": "3"})
    with pytest.raises(ValueError, match="unknown columns"):
        update_where(spark, t, "id = 1", {"nope": "3"})


def test_update_where_purges_dv_on_hit_files(spark, tmp_path):
    from deltalake2db_spark.sources.maintenance import update_where

    t = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr("id", "cast(id as double) as price")
    write_delta(df, t)
    delete_where(spark, t, "id in (7, 8)")
    update_where(spark, t, "id = 9", {"price": "-1.0"})
    out = scan_delta(spark, t)
    assert out.count() == 98
    assert out.filter("id in (7, 8)").count() == 0  # stay deleted
    assert out.filter("id = 9").collect()[0]["price"] == -1.0


def test_merge_into_upsert(spark, tmp_path):
    from deltalake2db_spark.sources.maintenance import merge_into

    t = str(tmp_path / "t")
    df = spark.range(0, 100).selectExpr(
        "id as k", "cast(id as double) as qty", "concat('n', id) as name"
    )
    write_delta(df.repartition(4), t)
    src = spark.createDataFrame(
        [(50, 999.0, "upd50"), (200, 1.0, "new200")],
        "k long, qty double, name string",
    )
    rep = merge_into(spark, t, src, on=["k"])
    assert rep["matched_files"] >= 1
    out = scan_delta(spark, t)
    assert out.count() == 101
    assert out.filter("k = 50").collect()[0]["name"] == "upd50"
    assert out.filter("k = 200").collect()[0]["qty"] == 1.0
    assert out.filter("k = 51").collect()[0]["name"] == "n51"  # untouched


def test_merge_into_expr_update_and_delete(spark, tmp_path):
    from deltalake2db_spark.sources.maintenance import merge_into

    t = str(tmp_path / "t")
    write_delta(
        spark.range(0, 20).selectExpr("id as k", "cast(id as double) as qty"),
        t,
    )
    src = spark.createDataFrame([(5, 10.0)], "k long, qty double")
    merge_into(
        spark, t, src, on=["k"],
        when_matched_update={"qty": "t.qty + s.qty"},
        when_not_matched_insert=False,
    )
    assert scan_delta(spark, t).filter("k = 5").collect()[0]["qty"] == 15.0
    merge_into(
        spark, t, src, on=["k"],
        when_matched_update=None, when_matched_delete=True,
        when_not_matched_insert=False,
    )
    out = scan_delta(spark, t)
    assert out.filter("k = 5").count() == 0 and out.count() == 19


def test_merge_into_rejects_duplicate_source_keys(spark, tmp_path):
    import pytest

    from deltalake2db_spark.sources.maintenance import merge_into

    t = str(tmp_path / "t")
    write_delta(spark.range(0, 5).selectExpr("id as k"), t)
    src = spark.createDataFrame([(1,), (1,)], "k long")
    with pytest.raises(ValueError, match="multiple source rows"):
        merge_into(spark, t, src, on=["k"])


def test_merge_into_partitioned_insert_lands_in_partition(spark, tmp_path):
    from deltalake2db_spark.sources.maintenance import merge_into

    t = str(tmp_path / "t")
    write_delta(
        spark.range(0, 30).selectExpr(
            "id as k", "id % 3 as g", "cast(id as double) as v"
        ),
        t,
        partition_by=("g",),
    )
    src = spark.createDataFrame(
        [(5, 2, 100.0), (100, 1, 7.0)], "k long, g long, v double"
    )
    merge_into(spark, t, src, on=["k"])
    out = scan_delta(spark, t)
    assert out.count() == 31
    assert out.filter("k = 5").collect()[0]["v"] == 100.0
    new = out.filter("k = 100").collect()[0]
    assert new["g"] == 1
    # the insert landed in the g=1 partition group (pruning finds it)
    from deltalake2db_spark import get_meta

    acts = list(
        get_meta(t).get_add_actions_filtered([("g", "=", 1)])
    )
    import json

    assert any(
        json.loads(a["stats"])["maxValues"].get("k") == 100 for a in acts
    )


def test_optimize_and_update_on_column_mapped_table(spark, tmp_path):
    """Physical-name rewrite: mapped tables (nested struct physical
    names included) compact and update correctly — logical content is
    invariant under the physical projection roundtrip."""
    import sys

    sys.path.insert(0, __file__.rsplit("/", 1)[0])
    from fixture_tables import build_faker2

    from deltalake2db_spark.sources.maintenance import update_where

    p = build_faker2(str(tmp_path / "faker2"))
    before = [
        r.asDict(True)
        for r in scan_delta(spark, p).orderBy("Super Name").collect()
    ]
    rep = optimize(spark, p)
    assert rep["version"] is not None
    after = [
        r.asDict(True)
        for r in scan_delta(spark, p).orderBy("Super Name").collect()
    ]
    assert before == after

    rep2 = update_where(
        spark, p, "`Super Name` = 'Name 2'", {"new_name": "'RENAMED'"}
    )
    assert rep2["updated_files"] == 1
    out = scan_delta(spark, p)
    row = out.filter("`Super Name` = 'Name 2'").collect()[0]
    assert row["new_name"] == "RENAMED"
    assert row["main_coord"]["lat"] == 3.5  # nested mapping survives
    assert row["Company Very Short"] == "BMS"  # partition value intact
    assert out.count() == len(before)


def test_dml_on_shallow_clone_stays_inside_clone(spark, tmp_path):
    """A shallow clone's add actions are ABSOLUTE URIs into the source
    table; copy-on-write rewrites must land under the CLONE's root in
    hive layout (they previously leaked into a literal 'file:'
    directory derived from the source URI) and never touch the
    source."""
    import os

    from deltalake2db_spark.sources.maintenance import (
        shallow_clone,
        update_where,
    )

    src, dst = str(tmp_path / "src"), str(tmp_path / "dst")
    write_delta(
        spark.range(0, 50).selectExpr(
            "id", "cast(id as double) as v", "cast(id % 3 as int) as p"
        ),
        src, partition_by=["p"],
    )
    shallow_clone(spark, src, dst)
    update_where(spark, dst, "id = 5", {"v": "-5"})

    assert scan_delta(spark, dst).filter("id=5").collect()[0]["v"] == -5.0
    assert scan_delta(spark, src).filter("id=5").collect()[0]["v"] == 5.0
    new_files = [
        os.path.join(r, f)
        for r, _d, fs in os.walk(dst) for f in fs if f.endswith(".parquet")
    ]
    # exactly the rewritten group's file, in hive layout under dst
    assert len(new_files) == 1 and "/p=2/" in new_files[0]
    assert not any("file:" in f for f in new_files)

    # OPTIMIZE localizes the remaining absolute-path files too
    rep = optimize(spark, dst, min_files=1)
    assert rep["files_added"] >= 1
    assert scan_delta(spark, dst).count() == 50


def test_cleanup_expired_logs(spark, tmp_path_factory):
    """Commits below the newest checkpoint and past retention are
    reclaimed; the snapshot and in-window time travel still replay."""
    import os

    from deltalake2db_spark import cleanup_expired_logs, scan_delta, write_delta
    from deltalake2db_spark.plans.meta import get_meta

    t = str(tmp_path_factory.mktemp("mx") / "logclean")
    for i in range(13):  # versions 0..12, checkpoint at 10
        write_delta(
            spark.range(i * 2, i * 2 + 2).selectExpr("id"),
            t,
            mode="error" if i == 0 else "append",
        )
    log = os.path.join(t, "_delta_log")
    assert os.path.exists(os.path.join(log, "%020d.checkpoint.parquet" % 10))
    # dry run with retention 0: everything below version 10 qualifies
    victims = cleanup_expired_logs(t, retention_hours=0, dry_run=True)
    assert sorted(int(v[:20]) for v in victims) == list(range(10))
    assert all(os.path.exists(os.path.join(log, v)) for v in victims)
    # real run
    assert cleanup_expired_logs(t, retention_hours=0) == victims
    assert not any(os.path.exists(os.path.join(log, v)) for v in victims)
    # current snapshot replays from the checkpoint
    assert scan_delta(spark, t).count() == 26
    # in-window travel (>= checkpoint) still works; expired raises
    assert scan_delta(spark, t, version=11).count() == 24
    import pytest

    with pytest.raises(Exception):
        scan_delta(spark, t, version=3).collect()
    # default retention (30 days) reclaims nothing this fresh
    assert cleanup_expired_logs(t, dry_run=True) == []
    # timestamp resolution starts at the earliest RETAINED commit, not
    # version 0 (whose JSON is gone): in-window timestamps resolve,
    # expired ones raise an explicit history-expired error
    from deltalake2db_spark.plans.meta import version_at_timestamp

    base_s = 1700000000000 / 1000.0
    assert version_at_timestamp(t, base_s + 0.011) == 11
    assert (
        version_at_timestamp(t, base_s + 0.010, mode="at_or_after") == 10
    )
    with pytest.raises(ValueError, match="expired"):
        version_at_timestamp(t, base_s + 0.003)
