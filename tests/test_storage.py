"""storage_options -> Hadoop conf mapping (no cloud access needed)."""

from __future__ import annotations

import pytest

from deltalake2db_spark.sources.storage import (
    account_name_from_path,
    azure_confs,
    normalize_azure_path,
    s3_confs,
    storage_confs_for_path,
)


def test_account_name_from_path():
    assert account_name_from_path("az://acct.blob.core.windows.net/c/p") == "acct"
    assert account_name_from_path("abfss://c@acct.dfs.core.windows.net/p") == "acct"
    assert account_name_from_path("/local/path") is None


def test_normalize_azure_path():
    assert (
        normalize_azure_path("az://acct.blob.core.windows.net/cont/tbl")
        == "abfss://cont@acct.dfs.core.windows.net/tbl"
    )
    p = normalize_azure_path("az://cont/tbl")
    assert p.startswith("abfss://cont@{account_name}")
    assert normalize_azure_path("abfss://c@a.dfs.core.windows.net/t").startswith("abfss://")


def test_azure_key_auth():
    confs = azure_confs({"account_name": "acct", "account_key": "k123"})
    assert confs["fs.azure.account.auth.type.acct.dfs.core.windows.net"] == "SharedKey"
    assert confs["fs.azure.account.key.acct.dfs.core.windows.net"] == "k123"


def test_azure_sas_and_spn():
    sas = azure_confs({"account_name": "a", "sas_token": "sig=x"})
    assert sas["fs.azure.account.auth.type.a.dfs.core.windows.net"] == "SAS"
    spn = azure_confs(
        {"account_name": "a", "client_id": "c", "client_secret": "s", "tenant_id": "t"}
    )
    assert spn["fs.azure.account.auth.type.a.dfs.core.windows.net"] == "OAuth"
    assert "login.microsoftonline.com/t" in (
        spn["fs.azure.account.oauth2.client.endpoint.a.dfs.core.windows.net"]
    )


def test_azure_connection_string_and_emulator():
    cs = azure_confs(
        {"connection_string": "DefaultEndpointsProtocol=https;AccountName=acct;AccountKey=abc=="}
    )
    assert cs["fs.azure.account.key.acct.dfs.core.windows.net"] == "abc=="
    emu = azure_confs({"use_emulator": "1"})
    assert any("devstoreaccount1" in k for k in emu)


def test_azure_requires_account():
    with pytest.raises(ValueError):
        azure_confs({"account_key": "k"})


def test_s3_confs():
    confs = s3_confs(
        {"AWS_ACCESS_KEY_ID": "id", "AWS_SECRET_ACCESS_KEY": "sec",
         "AWS_ENDPOINT_URL": "http://minio:9000", "AWS_REGION": "eu-west-1"}
    )
    assert confs["fs.s3a.access.key"] == "id"
    assert confs["fs.s3a.endpoint"] == "http://minio:9000"
    assert confs["fs.s3a.path.style.access"] == "true"


def test_scan_over_non_local_uri(spark, tmp_path):
    """End-to-end scan of a table whose _delta_log lives behind a
    NON-file:// URI: metadata I/O (JSON commits, checkpoint parquet,
    _last_checkpoint, dir listing) goes through the pyarrow-fs branch of
    MetadataIO, data files resolve as absolute file:// URIs for Spark.
    Uses pyarrow's in-memory mock filesystem — exercises every line a
    real az:// / s3:// first call would, minus the network."""
    import json

    import pyarrow as pa
    import pyarrow.fs as pafs
    import pyarrow.parquet as pq

    from deltalake2db_spark import get_meta, scan_delta

    # a real local parquet data file the JVM can read
    data = pa.table({"x": [1, 2, 3], "name": ["a", "b", "c"]})
    data_path = str(tmp_path / "part-0.parquet")
    pq.write_table(data, data_path)

    schema_json = {
        "type": "struct",
        "fields": [
            {"name": "x", "type": "long", "nullable": True, "metadata": {}},
            {"name": "name", "type": "string", "nullable": True, "metadata": {}},
        ],
    }
    actions = [
        {"commitInfo": {"timestamp": 1700000000000, "operation": "WRITE"}},
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2}},
        {"metaData": {"id": "t1", "format": {"provider": "parquet", "options": {}},
                      "schemaString": json.dumps(schema_json),
                      "partitionColumns": [], "configuration": {},
                      "createdTime": 1700000000000}},
        {"add": {"path": f"file://{data_path}", "partitionValues": {},
                 "size": 1, "modificationTime": 1700000000000, "dataChange": True,
                 "stats": json.dumps({"numRecords": 3,
                                      "minValues": {"x": 1}, "maxValues": {"x": 3},
                                      "nullCount": {"x": 0}})}},
    ]
    mockfs = pafs._MockFileSystem()
    mockfs.create_dir("tbl/_delta_log")
    with mockfs.open_output_stream("tbl/_delta_log/00000000000000000000.json") as f:
        f.write(("\n".join(json.dumps(a) for a in actions) + "\n").encode())

    so = {"filesystem": mockfs}
    m = get_meta("mock://tbl", storage_options=so)
    assert m.version == 0 and len(m.add_actions) == 1
    assert m._io.list_files("mock://tbl/_delta_log") == [
        "tbl/_delta_log/00000000000000000000.json"
    ]

    df = scan_delta(spark, "mock://tbl", storage_options=so)
    assert {tuple(r) for r in df.collect()} == {(1, "a"), (2, "b"), (3, "c")}
    # driver-side stats pruning still applies on the schemed path
    assert scan_delta(spark, "mock://tbl", storage_options=so,
                      conditions=[("x", ">", 5)]).count() == 0

    # checkpoint parquet read through the same injected filesystem
    cp_rows = [
        {"protocol": {"minReaderVersion": 1, "minWriterVersion": 2},
         "metaData": None, "add": None},
        {"protocol": None,
         "metaData": {"id": "t1", "format": {"provider": "parquet", "options": []},
                      "schemaString": json.dumps(schema_json),
                      "partitionColumns": [], "configuration": [],
                      "createdTime": 1700000000000},
         "add": None},
        {"protocol": None, "metaData": None,
         "add": {"path": f"file://{data_path}", "partitionValues": [],
                 "size": 1, "modificationTime": 1700000000000,
                 "dataChange": True}},
    ]
    buf = pa.BufferOutputStream()
    pq.write_table(pa.Table.from_pylist(cp_rows), buf)
    with mockfs.open_output_stream(
        "tbl/_delta_log/00000000000000000000.checkpoint.parquet"
    ) as f:
        f.write(buf.getvalue().to_pybytes())
    with mockfs.open_output_stream("tbl/_delta_log/_last_checkpoint") as f:
        f.write(json.dumps({"version": 0, "size": 3}).encode())

    m2 = get_meta("mock://tbl", storage_options=so)  # bootstraps from cp
    assert m2.version == 0 and len(m2.add_actions) == 1
    assert scan_delta(spark, "mock://tbl", storage_options=so).count() == 3


def test_storage_confs_for_path_dispatch():
    p, confs = storage_confs_for_path(
        "az://acct.blob.core.windows.net/c/tbl", {"account_key": "k"}
    )
    assert p == "abfss://c@acct.dfs.core.windows.net/tbl"
    assert confs["fs.azure.account.key.acct.dfs.core.windows.net"] == "k"

    p, confs = storage_confs_for_path("s3://bucket/tbl", {"AWS_ACCESS_KEY_ID": "i",
                                                          "AWS_SECRET_ACCESS_KEY": "s"})
    assert p == "s3a://bucket/tbl"
    assert confs["fs.s3a.access.key"] == "i"

    p, confs = storage_confs_for_path("/local/tbl", None)
    assert p == "/local/tbl" and confs == {}
