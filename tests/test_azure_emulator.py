"""Azure-emulator parity for the driver-side (MetadataIO / pyarrow)
layer — the sandbox equivalent of the reference's Azurite suite
(``/root/reference/test_server/__init__.py``,
``tests/test_duckdb_az.py``): a real Delta table is served over the
Azure Blob REST protocol by ``azurite_server`` and read back through
``az://`` paths with ``use_emulator`` storage_options, via the genuine
Azure C++ SDK inside ``pyarrow.fs.AzureFileSystem`` (SharedKey-signed
requests, ranged blob reads, hierarchy listings).

Scope finding (documented, r9): the Spark DATA path for ``az://``
needs the ``hadoop-azure`` (ABFS) jar, which this pyspark distribution
does not bundle — so executor-side reads cannot be exercised here.
Everything the DRIVER does against Azure IS exercised end-to-end:
log replay, time travel, schema, file listing, stats-based file
skipping, and raw parquet data-file bytes through the same filesystem.
"""

from __future__ import annotations

import os
import shutil
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from azurite_server import start_server  # noqa: E402

from deltalake2db_spark.plans.meta import get_meta  # noqa: E402


@pytest.fixture(scope="module")
def az_table(spark, tmp_path_factory):
    """A 3-commit Delta table served over the blob emulator.

    Returns (az_uri, local_path, storage_options)."""
    from deltalake2db_spark.sources.delta_sink import delete_where, write_delta

    root = tmp_path_factory.mktemp("azroot")
    local = os.path.join(str(root), "cont", "tbl")
    write_delta(
        spark.range(0, 1000).selectExpr(
            "id", "id * 2 as v", "CAST(id % 4 AS INT) as part"
        ),
        local,
        partition_by=["part"],
    )
    write_delta(
        spark.range(1000, 1500).selectExpr(
            "id", "id * 2 as v", "CAST(id % 4 AS INT) as part"
        ),
        local,
    )
    delete_where(spark, local, "id % 10 = 3")
    auth, srv = start_server(str(root))
    so = {"use_emulator": "1", "blob_storage_authority": auth}
    yield "az://cont/tbl", local, so
    srv.shutdown()


def test_meta_replay_over_az(az_table):
    az_uri, local, so = az_table
    remote = get_meta(az_uri, storage_options=so)
    ref = get_meta(local)
    assert remote.version == ref.version >= 2
    assert remote.schema_json == ref.schema_json
    assert remote.partition_columns == ["part"]
    assert set(remote.add_actions) == set(ref.add_actions)


def test_time_travel_over_az(az_table):
    az_uri, local, so = az_table
    for v in (0, 1):
        remote = get_meta(az_uri, storage_options=so, version=v)
        ref = get_meta(local, version=v)
        assert remote.version == ref.version == v
        assert set(remote.add_actions) == set(ref.add_actions)


def test_log_listing_over_az(az_table):
    az_uri, local, so = az_table
    from deltalake2db_spark.plans.meta import MetadataIO

    io = MetadataIO(so)
    got = sorted(
        p.rsplit("/", 1)[-1] for p in io.list_files(az_uri + "/_delta_log")
    )
    ref = sorted(os.listdir(os.path.join(local, "_delta_log")))
    assert got == ref and any(n.endswith(".json") for n in got)


def test_stats_skipping_over_az(az_table):
    """File-level stats pruning must make identical keep/skip decisions
    from the emulator-served log as from the local one."""
    az_uri, local, so = az_table
    conditions = [("id", ">", 1200)]
    remote = get_meta(az_uri, storage_options=so)
    ref = get_meta(local)
    kept_r = {a["path"] for a in remote.get_add_actions_filtered(conditions)}
    kept_l = {a["path"] for a in ref.get_add_actions_filtered(conditions)}
    assert kept_r == kept_l
    assert 0 < len(kept_r) < len(remote.add_actions)  # pruning really bit


def test_data_parquet_bytes_over_az(az_table):
    """A data file's PARQUET CONTENT read through the Azure protocol
    (SDK-ranged requests incl. the footer suffix-range) equals the
    local bytes — the executor-side read path at the pyarrow layer."""
    import pyarrow.parquet as pq

    from deltalake2db_spark.sources.storage import (
        azure_container_path,
        pyarrow_azure_fs,
    )

    from urllib.parse import unquote

    az_uri, local, so = az_table
    state = get_meta(az_uri, storage_options=so)
    rel = unquote(sorted(state.add_actions)[0])  # spec: add.path is URL-encoded
    fs = pyarrow_azure_fs(so)
    with fs.open_input_file(azure_container_path(az_uri) + "/" + rel) as fh:
        remote_t = pq.read_table(fh)
    local_t = pq.read_table(os.path.join(local, rel))
    assert remote_t.equals(local_t) and remote_t.num_rows > 0


def test_missing_table_over_az(az_table):
    az_uri, _local, so = az_table
    with pytest.raises(FileNotFoundError):
        get_meta("az://cont/absent", storage_options=so)
