"""In-commit timestamps (Delta writer feature `inCommitTimestamp`):
monotonic stamping, protocol surface, reader time-travel preference,
and post-hoc enablement."""

from __future__ import annotations

import json
import os

import pytest

from deltalake2db_spark import scan_delta
from deltalake2db_spark.plans.meta import get_meta, version_at_timestamp
from deltalake2db_spark.sources.delta_sink import write_delta
from deltalake2db_spark.sources.delta_writer import DeltaWriter
from deltalake2db_spark.sources.maintenance import set_table_properties

ICT_PROP = "delta.enableInCommitTimestamps"


def _commit_info(path, version):
    fn = os.path.join(path, "_delta_log", f"{version:020d}.json")
    with open(fn) as fh:
        first = json.loads(fh.readline())
    return first["commitInfo"]


def test_created_with_ict_stamps_every_commit(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(
        spark.range(5).selectExpr("id", "id * 2 as v"), path,
        configuration={ICT_PROP: "true"},
    )
    write_delta(spark.range(5, 8).selectExpr("id", "id * 2 as v"),
                path, mode="append")
    write_delta(spark.range(8, 9).selectExpr("id", "id * 2 as v"),
                path, mode="append")
    icts = [_commit_info(path, v)["inCommitTimestamp"]
            for v in range(3)]
    assert icts[0] < icts[1] < icts[2]
    # protocol: writer v7 with the feature + legacy features listed
    proto = get_meta(path).protocol
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    assert "appendOnly" in proto["writerFeatures"]
    # reader unaffected (minReaderVersion 1): scan works
    assert scan_delta(spark, path).count() == 9


def test_monotonic_under_clock_regression(tmp_path):
    """A wall clock that goes BACKWARDS must not break monotonicity —
    the exact failure ICT exists to prevent."""
    import pyarrow as pa

    path = str(tmp_path / "t")
    w = DeltaWriter(path)
    meta = w.metadata_action(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}}]},
        configuration={ICT_PROP: "true"},
    )
    w.commit([w.protocol_action(1, 7,
                                writer_features=["inCommitTimestamp"]),
              meta,
              w.add_data_file(pa.table({"id": [1]}))],
             timestamp_ms=2000000000000)
    w.commit([w.add_data_file(pa.table({"id": [2]}))],
             timestamp_ms=1000000000000)  # clock regressed 1000s
    w.commit([w.add_data_file(pa.table({"id": [3]}))],
             timestamp_ms=1000000000000)
    icts = [_commit_info(path, v)["inCommitTimestamp"]
            for v in range(3)]
    assert icts[0] < icts[1] < icts[2]
    # the regressed commits advance by the minimum step
    assert icts[1] == icts[0] + 1 and icts[2] == icts[1] + 1


def test_time_travel_prefers_ict(spark, tmp_path):
    """version_at_timestamp resolves against inCommitTimestamp even
    when plain commitInfo.timestamp ties or regresses."""
    import pyarrow as pa

    path = str(tmp_path / "t")
    w = DeltaWriter(path)
    meta = w.metadata_action(
        {"type": "struct", "fields": [
            {"name": "id", "type": "long", "nullable": True,
             "metadata": {}}]},
        configuration={ICT_PROP: "true"},
    )
    w.commit([w.protocol_action(1, 7,
                                writer_features=["inCommitTimestamp"]),
              meta, w.add_data_file(pa.table({"id": [1]}))],
             timestamp_ms=3000000000000)
    # second commit's plain timestamp REGRESSES; its ICT advances
    w.commit([w.add_data_file(pa.table({"id": [2]}))],
             timestamp_ms=1000000000000)
    ict0 = _commit_info(path, 0)["inCommitTimestamp"]
    ict1 = _commit_info(path, 1)["inCommitTimestamp"]
    assert ict1 == ict0 + 1
    assert version_at_timestamp(path, ict0 / 1000.0) == 0
    assert version_at_timestamp(path, ict1 / 1000.0) == 1
    df = scan_delta(spark, path, timestamp=ict0 / 1000.0)
    assert df.count() == 1


def test_post_hoc_enablement(spark, tmp_path):
    path = str(tmp_path / "t")
    write_delta(spark.range(3).selectExpr("id"), path)
    assert "inCommitTimestamp" not in json.dumps(
        get_meta(path).protocol
    )
    out = set_table_properties(spark, path, {ICT_PROP: "true"})
    cfg = out["configuration"]
    assert cfg["delta.inCommitTimestampEnablementVersion"] == "1"
    assert "delta.inCommitTimestampEnablementTimestamp" in cfg
    proto = get_meta(path).protocol
    assert proto["minWriterVersion"] == 7
    assert "inCommitTimestamp" in proto["writerFeatures"]
    # the enabling commit itself and every later one carry ICT
    assert "inCommitTimestamp" in _commit_info(path, 1)
    write_delta(spark.range(3, 6).selectExpr("id"), path, mode="append")
    i1 = _commit_info(path, 1)["inCommitTimestamp"]
    i2 = _commit_info(path, 2)["inCommitTimestamp"]
    assert i2 > i1
    # v0 (pre-enablement) has no ICT
    assert "inCommitTimestamp" not in _commit_info(path, 0)


def test_enablement_timestamp_matches_stamped_ict(spark, tmp_path):
    """Spec: delta.inCommitTimestampEnablementTimestamp must EQUAL the
    enablement commit's stamped inCommitTimestamp — including when a
    prior commit carried a timestamp above the default clock base, so
    the monotonic max(prev+1, base+version) rule is what decides."""
    path = str(tmp_path / "t")
    write_delta(spark.range(3).selectExpr("id"), path)
    # a non-default, high clock on the pre-enablement commit
    state = get_meta(path)
    w = DeltaWriter(path)
    w.version = state.version
    w.commit(
        [{"metaData": dict(state.last_metadata)}],
        timestamp_ms=1800000000000,
        operation="SET TBLPROPERTIES",
    )
    out = set_table_properties(spark, path, {ICT_PROP: "true"})
    cfg = out["configuration"]
    enable_v = int(cfg["delta.inCommitTimestampEnablementVersion"])
    stamped = _commit_info(path, enable_v)["inCommitTimestamp"]
    assert cfg["delta.inCommitTimestampEnablementTimestamp"] == str(
        stamped
    )
    # and the monotonic rule actually bit: the stamp rides above the
    # fabricated-base value the old code would have written
    assert stamped > 1700000000000 + enable_v


def test_reenablement_over_high_ict_span(spark, tmp_path):
    """Read-back differential for re-enablement over a HIGH prior ICT
    span: a table runs with ICT on and a far-future clock (every
    commit stamps ~9e12), disables ICT (the disable commit carries
    only its plain commitInfo timestamp, same high clock), then
    re-enables post-hoc with the default low clock.  The enablement
    commit's stamped ICT must ride the monotonic rule over the high
    watermark (prev + 1, NOT the fabricated default base), and the
    delta.inCommitTimestampEnablementTimestamp property must EQUAL
    that stamped value — the exact desync the r13 ADVICE described."""
    path = str(tmp_path / "t")
    write_delta(
        spark.range(3).selectExpr("id"), path,
        configuration={ICT_PROP: "true"},
    )
    HIGH = 9000000000000
    state = get_meta(path)
    w = DeltaWriter(path)
    w.version = state.version
    # ICT-stamped commit at the far-future clock
    w.commit(
        [{"metaData": dict(state.last_metadata)}],
        timestamp_ms=HIGH,
        operation="SET TBLPROPERTIES",
    )
    high_ict = _commit_info(path, w.version)["inCommitTimestamp"]
    assert high_ict >= HIGH
    # disable: this commit is NOT stamped (property turns false in
    # the same commit) but its commitInfo timestamp carries the high
    # clock forward
    md = dict(get_meta(path).last_metadata)
    cfg = dict(md.get("configuration") or {})
    cfg[ICT_PROP] = "false"
    md["configuration"] = cfg
    w.commit(
        [{"metaData": md}],
        timestamp_ms=HIGH,
        operation="SET TBLPROPERTIES",
    )
    assert "inCommitTimestamp" not in _commit_info(path, w.version)
    # re-enable with the default (low) clock: post-hoc enablement
    out = set_table_properties(spark, path, {ICT_PROP: "true"})
    cfg = out["configuration"]
    enable_v = int(cfg["delta.inCommitTimestampEnablementVersion"])
    stamped = _commit_info(path, enable_v)["inCommitTimestamp"]
    # property == stamped ICT (spec), and the monotonic rule carried
    # the high watermark: prev (the disable commit's timestamp) + 1
    # beats the fabricated 1700000000000 + version by ~7e12
    assert cfg["delta.inCommitTimestampEnablementTimestamp"] == str(
        stamped
    )
    assert stamped > HIGH
    assert stamped > high_ict
    # the span stays monotonic for subsequent writers
    write_delta(spark.range(3, 5).selectExpr("id"), path, mode="append")
    nxt = _commit_info(path, enable_v + 1)["inCommitTimestamp"]
    assert nxt > stamped


def test_post_hoc_enablement_keeps_column_mapping_feature(tmp_path):
    """Upgrading a writer-v5 (columnMapping) table to v7 for ICT must
    keep columnMapping in writerFeatures — dropping it is a protocol
    violation for external Delta clients."""
    import pyspark.sql.types as T

    path = str(tmp_path / "t")
    w = DeltaWriter(path)
    schema = T.StructType([T.StructField("id", T.LongType())])
    md = w.metadata_action(
        json.loads(schema.json()),
        configuration={"delta.columnMapping.mode": "name"},
    )
    w.commit(
        [{"protocol": {"minReaderVersion": 2, "minWriterVersion": 5}}, md],
        operation="CREATE TABLE",
    )
    out = set_table_properties(None, path, {ICT_PROP: "true"})
    proto = get_meta(path).protocol
    assert proto["minWriterVersion"] == 7
    feats = set(proto["writerFeatures"])
    assert {"columnMapping", "inCommitTimestamp"} <= feats
