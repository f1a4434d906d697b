"""End-to-end scan over a NON-local filesystem scheme.

The reference proves its cloud path by running its whole surface over
``az://`` against an Azurite test server
(``/root/reference/tests/test_duckdb_az.py:46-141``); this is the
Spark-side equivalent with a stdlib WebHDFS server: the table's DATA
files are read by the Spark JVM over ``webhdfs://`` (HTTP), not
``file://`` — exercising URI construction, scheme-qualified multi-path
reads, and the metadata storage_options hatch together.
"""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from deltalake2db_spark import scan_delta
from deltalake2db_spark.sources.delta_sink import write_delta
from webhdfs_server import start_server


class _HostStripLocal:
    """pyarrow-like filesystem for the metadata side: strips the
    ``host:port`` the scheme leaves on the path and serves local files
    (metadata correctness over non-local tables is covered separately
    by the mock-FS test; HERE the point is the JVM data path)."""

    def __init__(self):
        import pyarrow.fs as pafs

        self._local = pafs.LocalFileSystem()

    def _strip(self, path: str) -> str:
        return "/" + path.split("/", 1)[1]

    def open_input_file(self, path: str):
        return self._local.open_input_file(self._strip(path))

    def get_file_info(self, sel):
        import pyarrow.fs as pafs

        sel2 = pafs.FileSelector(
            self._strip(sel.base_dir), allow_not_found=sel.allow_not_found
        )
        return self._local.get_file_info(sel2)


@pytest.fixture(scope="module")
def webhdfs(tmp_path_factory):
    srv, hostport = start_server()
    yield hostport
    srv.shutdown()


def test_plain_parquet_read_over_webhdfs(spark, webhdfs, tmp_path_factory):
    root = tmp_path_factory.mktemp("whdfs_pq")
    local = str(root / "t.parquet")
    spark.range(0, 1000).selectExpr("id", "id * 2 as v").coalesce(
        2
    ).write.parquet(local)
    got = spark.read.parquet(f"webhdfs://{webhdfs}{local}")
    assert got.count() == 1000
    assert got.agg(F.sum("v")).collect()[0][0] == 999 * 1000
    # filters/pruning still reach the remote scan
    assert got.filter("id < 10").count() == 10


def test_scan_delta_data_over_webhdfs(spark, webhdfs, tmp_path_factory):
    root = tmp_path_factory.mktemp("whdfs_delta")
    local = str(root / "tbl")
    df = spark.range(0, 500).selectExpr(
        "id", "cast(id % 3 as int) as part", "cast(id as double) as v"
    )
    write_delta(df.repartition(2), local, partition_by=["part"])

    remote = f"webhdfs://{webhdfs}{local}"
    so = {"filesystem": _HostStripLocal()}
    got = scan_delta(spark, remote, storage_options=so)
    # every data file URI the plan reads must be webhdfs://
    files = got.inputFiles()
    assert files and all(f.startswith("webhdfs://") for f in files)

    expect = {(r["id"]): (r["part"], r["v"]) for r in df.collect()}
    have = {(r["id"]): (r["part"], r["v"]) for r in got.collect()}
    assert have == expect

    # partition pruning against the remote table
    pruned = scan_delta(
        spark, remote, storage_options=so,
        conditions=[("part", "=", 1)],
    )
    assert pruned.count() == sum(1 for i in range(500) if i % 3 == 1)
