"""Deletion vectors: codec (Z85 + roaring), scan anti-join, SQL
emission, Python Data Source masking, and the delete_where writer.

The reference engine REJECTS DV tables (protocol_check.py lists
deletionVectors as unsupported); this suite covers the extension that
reads and writes them.
"""

from __future__ import annotations

import struct

import pytest
from hypothesis import given, settings
from hypothesis import strategies as st
from pyspark.sql import functions as F

from deltalake2db_spark import get_meta, scan_delta
from deltalake2db_spark.plans.deletion_vectors import (
    inline_descriptor,
    parse_dv_blob,
    read_descriptor,
    serialize_dv_blob,
    write_dv_file,
    z85_decode,
    z85_encode,
)
from deltalake2db_spark.sources.delta_sink import delete_where, write_delta


def test_z85_spec_vector():
    # the ZeroMQ spec-32 reference vector
    raw = bytes([0x86, 0x4F, 0xD2, 0x6F, 0xB5, 0x59, 0xF7, 0x5B])
    assert z85_encode(raw) == "HelloWorld"
    assert z85_decode("HelloWorld") == raw


def test_roaring_known_bytes():
    # one array container, key 0, values {1,2,3}: no-run cookie 12346,
    # size 1, header (0, card-1=2), one offset (16), then the values
    blob = serialize_dv_blob([1, 2, 3])
    magic, nbuckets = struct.unpack_from("<IQ", blob, 0)
    assert magic == 1681511377 and nbuckets == 1
    (high,) = struct.unpack_from("<I", blob, 12)
    assert high == 0
    assert blob[16:] == struct.pack(
        "<IIHHI3H", 12346, 1, 0, 2, 16, 1, 2, 3
    )


def test_run_container_decode():
    # hand-built RUN serialization: cookie 12347 | (size-1)<<16, run
    # bitset 0b1, header (key 0, card 5-1), no offsets (size < 4), one
    # run [10, 14]
    body = struct.pack("<I", 12347) + b"\x01" + struct.pack(
        "<HHHHH", 0, 4, 1, 10, 4
    )
    blob = struct.pack("<IQI", 1681511377, 1, 0) + body
    assert parse_dv_blob(blob) == [10, 11, 12, 13, 14]


@settings(deadline=None, max_examples=30)
@given(
    idx=st.lists(
        st.integers(min_value=0, max_value=1 << 40),
        unique=True,
        max_size=300,
    )
)
def test_blob_roundtrip(idx):
    idx = sorted(idx)
    assert parse_dv_blob(serialize_dv_blob(idx)) == idx


def test_bitmap_container_roundtrip():
    # >4096 values in one 64K chunk forces a bitmap container
    idx = list(range(0, 20000, 3))
    assert parse_dv_blob(serialize_dv_blob(idx)) == idx


def test_inline_and_file_descriptors(tmp_path):
    d = inline_descriptor([0, 7, 42])
    assert d["storageType"] == "i" and d["cardinality"] == 3
    assert read_descriptor(d, str(tmp_path)) == [0, 7, 42]

    descs = write_dv_file(str(tmp_path), [[1, 2], list(range(5000))])
    assert [x["storageType"] for x in descs] == ["u", "u"]
    assert read_descriptor(descs[0], str(tmp_path)) == [1, 2]
    assert read_descriptor(descs[1], str(tmp_path)) == list(range(5000))


def test_uuid_with_slash_in_z85(tmp_path):
    # "/" is a Z85 alphabet character: a descriptor whose encoded UUID
    # contains one must NOT be path-split on it (regression)
    import uuid as uuid_mod

    from deltalake2db_spark.plans.deletion_vectors import dv_file_path

    uid = None
    for i in range(100000):
        cand = uuid_mod.UUID(int=i * 0x1234567890ABCDEF + 7)
        if "/" in z85_encode(cand.bytes):
            uid = cand
            break
    assert uid is not None
    desc = {"storageType": "u", "pathOrInlineDv": z85_encode(uid.bytes)}
    assert dv_file_path(desc, "/t") == f"/t/deletion_vector_{uid}.bin"
    # with a directory prefix (spec: prefix chars precede the 20-char uuid)
    desc2 = {"storageType": "u", "pathOrInlineDv": "ab" + z85_encode(uid.bytes)}
    assert dv_file_path(desc2, "/t") == f"/t/ab/deletion_vector_{uid}.bin"


@pytest.fixture(scope="module")
def dv_table(spark, tmp_path_factory):
    path = str(tmp_path_factory.mktemp("dv") / "t")
    df = spark.range(0, 1000).selectExpr(
        "id", "id % 7 as grp", "concat('row', id) as name"
    )
    write_delta(df, path)
    rep = delete_where(spark, path, "grp = 3")
    assert rep["deleted_rows"] == len([i for i in range(1000) if i % 7 == 3])
    return path


def test_delete_where_counts(spark, dv_table):
    out = scan_delta(spark, dv_table)
    expected = [i for i in range(1000) if i % 7 != 3]
    assert out.count() == len(expected)
    assert [r["id"] for r in out.orderBy("id").limit(5).collect()] == [
        0, 1, 2, 4, 5,
    ]


def test_protocol_upgraded(spark, dv_table):
    state = get_meta(dv_table)
    assert state.protocol["minReaderVersion"] == 3
    assert "deletionVectors" in state.protocol["readerFeatures"]


def test_time_travel_predates_delete(spark, dv_table):
    assert scan_delta(spark, dv_table, version=0).count() == 1000


def test_second_delete_merges(spark, dv_table):
    rep = delete_where(spark, dv_table, "id in (0, 1, 3)")  # 3 already gone
    assert rep["deleted_rows"] == 2
    assert scan_delta(spark, dv_table).count() == 1000 - 143 - 2
    # merged DVs survive conditions + select + limit
    assert (
        scan_delta(spark, dv_table, conditions=[("grp", "=", 3)]).count() == 0
    )
    assert scan_delta(spark, dv_table, select=["name"]).columns == ["name"]


def test_sql_emission_with_dv(spark, dv_table):
    from deltalake2db_spark import get_sql_for_delta

    sql = get_sql_for_delta(None, dv_table)
    assert spark.sql(sql).count() == scan_delta(spark, dv_table).count()


def test_pyds_with_dv(spark, dv_table):
    from deltalake2db_spark.sources.pyds import register

    register(spark)
    got = (
        spark.read.format("deltalake2db").option("path", dv_table).load()
    )
    assert got.count() == scan_delta(spark, dv_table).count()


def test_limit_pushdown_counts_live_rows():
    from deltalake2db_spark.plans.filters import iter_add_actions_filtered

    actions = [
        {
            "path": f"f{i}.parquet",
            "stats": '{"numRecords": 100}',
            "deletionVector": {"cardinality": 90},
        }
        for i in range(10)
    ]
    # 10 live rows per file -> limit 25 needs 3 files (not 1)
    got = list(iter_add_actions_filtered(actions, None, {}, {}, limit=25))
    assert len(got) == 3


def test_fully_deleted_file_yields_nothing(spark, tmp_path):
    path = str(tmp_path / "t2")
    df = spark.range(0, 10).selectExpr("id")
    write_delta(df, path)
    delete_where(spark, path, F.lit(True))
    assert scan_delta(spark, path).count() == 0
