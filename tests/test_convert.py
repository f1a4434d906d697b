"""CONVERT TO DELTA tests: in-place log creation over existing parquet."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from deltalake2db_spark import scan_delta
from deltalake2db_spark.sources.convert import convert_to_delta


@pytest.fixture()
def docs(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "documents.parquet"))


def test_convert_partitioned_roundtrip(spark, docs, tmp_path):
    path = str(tmp_path / "docs_pq")
    docs.write.partitionBy("lang").parquet(path)
    data_files_before = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet")
    )
    v = convert_to_delta(spark, path)
    assert v == 0
    # conversion moved/rewrote NOTHING
    data_files_after = sorted(
        os.path.join(r, f)
        for r, _d, fs in os.walk(path)
        for f in fs
        if f.endswith(".parquet") and "_delta_log" not in r
    )
    assert data_files_before == data_files_after

    got = scan_delta(spark, path)
    assert got.count() == docs.count()
    a = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in got.collect()}
    b = {r["doc_id"]: (r["lang"], r["n_chars"]) for r in docs.collect()}
    assert a == b


def test_convert_partition_pruning(spark, docs, tmp_path):
    from deltalake2db_spark.plans.meta import get_meta
    from deltalake2db_spark.plans.filters import iter_add_actions_filtered

    path = str(tmp_path / "docs_pq")
    docs.write.partitionBy("lang").parquet(path)
    convert_to_delta(spark, path)
    state = get_meta(path)
    conds = [("lang", "=", "en")]
    tmap, l2p = state.type_maps()
    kept = list(
        iter_add_actions_filtered(state.add_actions.values(), conds, tmap, l2p)
    )
    assert 0 < len(kept) < len(state.add_actions)
    n = scan_delta(spark, path, conditions=conds).count()
    assert n == docs.filter(F.col("lang") == "en").count()


def test_convert_unpartitioned(spark, docs, tmp_path):
    path = str(tmp_path / "flat_pq")
    docs.coalesce(2).write.parquet(path)
    convert_to_delta(spark, path)
    assert scan_delta(spark, path).count() == docs.count()


def test_convert_rejects_existing_delta_and_empty(spark, docs, tmp_path):
    path = str(tmp_path / "docs_pq")
    docs.write.parquet(path)
    convert_to_delta(spark, path)
    with pytest.raises(ValueError, match="already a Delta table"):
        convert_to_delta(spark, path)
    empty = tmp_path / "empty"
    empty.mkdir()
    with pytest.raises(ValueError, match="no parquet files"):
        convert_to_delta(spark, str(empty))
