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
