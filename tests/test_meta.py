"""Metadata planner tests — goldens mirror the reference's
``tests/test_meta.py`` (pruning counts, stats skipping, limit pushdown)."""

from __future__ import annotations

from datetime import date, timezone

from deltalake2db_spark import get_meta
from deltalake2db_spark.plans.protocol import is_protocol_supported


def test_meta_basics(user_table):
    m = get_meta(user_table)
    assert m.version == 0
    assert len(m.add_actions) == 1
    assert m.partition_columns == []
    assert m.last_write_time.tzinfo == timezone.utc
    assert is_protocol_supported(m)
    schema = m.schema
    assert schema is not None
    assert [f.name for f in schema.fields][:3] == ["User - iD", "FirstName", "LastName"]


def test_filtering_partition_values(partition_values_table):
    """Golden pruning counts from the reference tests/test_meta.py:31-79."""
    m = get_meta(partition_values_table)

    def n(conds=None):
        return len(list(m.get_add_actions_filtered(conds)))

    assert n() == 3
    assert n([("as_date", "=", date.fromisoformat("2021-09-08"))]) == 2
    assert n([("as_date", "<>", date.fromisoformat("2021-09-08"))]) == 1
    assert n([("as_date", "=", date.fromisoformat("2025-09-08"))]) == 0
    assert n([("as_string", "=", None)]) == 1
    assert n([("as_string", "in", [None, "0asdf2"])]) == 1
    assert n([("as_string", "=", "0asfd")]) == 0
    assert n([("as_string", "<>", "0asfd")]) == 3
    assert n([("as_string", "<>", None)]) == 2
    assert n([("as_int", ">=", "-1")]) == 2  # string coercion keeps non-null files
    assert n([("as_int", ">", 0)]) == 1
    assert n([("as_int", ">", 1)]) == 0
    assert n([("as_int", ">=", 1)]) == 1
    # legacy dict form
    assert n({"as_string": "1"}) == 1


def test_stats_skipping(stats_table):
    m = get_meta(stats_table)
    # orphan parquet file on disk must not appear in table state
    assert len(m.add_actions) == 1
    assert len(list(m.get_add_actions_filtered())) == 1
    assert len(list(m.get_add_actions_filtered([("as_int", "=", 0)]))) == 1
    assert len(list(m.get_add_actions_filtered([("as_int", "=", 2)]))) == 0


def test_stats_skipping_in_not_in(stats_table):
    """`not in` may only skip on a PROOF that no row satisfies it; a
    listed value outside [min,max] proves the opposite (the file matches)
    and must keep the file.  Fixture file: single row as_int=0
    (min=max=0, nullCount=0)."""
    m = get_meta(stats_table)

    def n(conds):
        return len(list(m.get_add_actions_filtered(conds)))

    # 100 is outside [0,0] -> every row satisfies `not in (100)` -> KEEP
    assert n([("as_int", "not in", [100])]) == 1
    assert n([("as_int", "in", [100])]) == 0  # no row can equal 100
    assert n([("as_int", "in", [0, 100])]) == 1
    # file provably constant 0 with no nulls -> `not in (0)` matches nothing
    assert n([("as_int", "not in", [0])]) == 0
    assert n([("as_int", "not in", [0, 100])]) == 0
    # NULL in the list: 3VL -> `not in (NULL, ...)` never TRUE -> skip
    assert n([("as_int", "not in", [None])]) == 0
    # empty list: `not in ()` folds TRUE for all rows -> keep
    assert n([("as_int", "not in", [])]) == 1


def test_limit_pushdown(stats_table):
    m = get_meta(stats_table)
    # limit accumulator checks AFTER yielding => at least one file
    assert len(list(m.get_add_actions_filtered(None, limit=0))) == 1
    assert len(list(m.get_add_actions_filtered([], limit=0))) == 1


def test_checkpoint_replay_and_time_travel(cluster_table):
    m = get_meta(cluster_table)
    assert m.version == 14
    # v0 file removed at v5; adds at v0..v14 => 15 adds - 1 remove
    assert len(m.add_actions) == 14
    assert m.configuration["delta.columnMapping.mode"] == "name"

    # time travel past the checkpoint (replays cp@10 + commits 11..12)
    m12 = get_meta(cluster_table, version=12)
    assert m12.version == 12
    assert len(m12.add_actions) == 12

    # time travel before the checkpoint: v-v%10=0 checkpoint missing
    # => full JSON replay from 0
    m5 = get_meta(cluster_table, version=5)
    assert m5.version == 5
    assert len(m5.add_actions) == 5  # 6 adds, 1 removed

    # update_incremental advances a stale snapshot to head
    m5.update_incremental()
    assert m5.version == 14
    assert len(m5.add_actions) == 14


def test_map_typed_checkpoint_partition_values(spark, tmp_path):
    """Checkpoints from real engines (delta-spark/delta-rs) store
    add.partitionValues as a parquet MAP; the reader must scan such
    tables (pyarrow yields dicts via maps_as_pydicts, or (k,v) tuples on
    older pyarrow — both normalized)."""
    import pyarrow as pa

    from deltalake2db_spark import scan_delta
    from deltalake2db_spark.sources.delta_writer import write_simple_delta

    t = pa.table({"p": ["a", "a", "b"], "x": [1, 2, 3]})
    path = str(tmp_path / "mapcp")
    w = write_simple_delta(path, t, partition_by=["p"])
    w.write_checkpoint(map_partition_values=True)

    m = get_meta(path)  # bootstraps from the MAP-typed checkpoint
    assert m.version == 0
    assert len(m.add_actions) == 2
    from deltalake2db_spark.plans.filters import normalize_partition_values

    for a in m.add_actions.values():
        pv = normalize_partition_values(a.get("partitionValues"))
        assert set(pv) == {"p"}
    assert len(list(m.get_add_actions_filtered([("p", "=", "a")]))) == 1

    got = {tuple(r) for r in scan_delta(spark, path).collect()}
    assert got == {("a", 1), ("a", 2), ("b", 3)}


def test_checkpoint_entry_list_partition_values(cluster_table):
    m = get_meta(cluster_table, version=10)
    # checkpoint-era adds carry partitionValues as {key,value} lists;
    # normalization must expose them as dicts
    from deltalake2db_spark.plans.filters import normalize_partition_values

    for a in m.add_actions.values():
        pv = normalize_partition_values(a.get("partitionValues"))
        assert isinstance(pv, dict) and len(pv) == 1


def test_version_at_timestamp_and_scan_travel(spark, tmp_path_factory):
    """timestampAsOf: latest commit <= ts; startingTimestamp mode:
    earliest commit >= ts. Commit times are the writer's deterministic
    base 1700000000000ms + version."""
    import pytest

    from deltalake2db_spark import scan_delta, write_delta
    from deltalake2db_spark.plans.meta import version_at_timestamp

    t = str(tmp_path_factory.mktemp("tsas") / "t")
    for i in range(3):  # versions 0,1,2 at base+0,+1,+2 ms
        write_delta(
            spark.range(i * 10, (i + 1) * 10).selectExpr("id"),
            t,
            mode="error" if i == 0 else "append",
        )
    base_s = 1700000000000 / 1000.0
    assert version_at_timestamp(t, base_s) == 0
    assert version_at_timestamp(t, base_s + 0.001) == 1
    # past the last commit: raises like delta-spark's timestampAsOf,
    # unless the caller opts into CDF-ending clamp semantics
    with pytest.raises(ValueError, match="after the last"):
        version_at_timestamp(t, base_s + 999)
    assert version_at_timestamp(t, base_s + 999, clamp_latest=True) == 2
    assert version_at_timestamp(t, base_s, mode="at_or_after") == 0
    assert (
        version_at_timestamp(t, base_s + 0.0005, mode="at_or_after") == 1
    )
    with pytest.raises(ValueError, match="before the first"):
        version_at_timestamp(t, base_s - 1)
    with pytest.raises(ValueError, match="after the last"):
        version_at_timestamp(t, base_s + 999, mode="at_or_after")
    # datetime / ISO string forms resolve identically
    from datetime import datetime, timezone

    dt = datetime.fromtimestamp(base_s + 0.001, tz=timezone.utc)
    assert version_at_timestamp(t, dt) == 1
    assert version_at_timestamp(t, dt.isoformat()) == 1

    assert scan_delta(spark, t, timestamp=base_s + 0.001).count() == 20
    with pytest.raises(ValueError, match="mutually exclusive"):
        scan_delta(spark, t, version=1, timestamp=base_s)
