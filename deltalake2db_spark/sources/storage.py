"""storage_options (delta-rs / reference dialect) -> Spark Hadoop confs.

Reference parity: ``deltalake2db/azure_helper.py`` + the DuckDB AZURE
secret builder (``deltalake2db/duckdb.py:223-312``).  The reference
translates one ``storage_options`` mapping into backend-specific
credentials (DuckDB secrets / fsspec kwargs / object_store opts); our
backend is Spark, so the same mapping lands on ``fs.azure.*`` /
``fs.s3a.*`` Hadoop configs that the ABFS / S3A connectors read.

Pure functions returning conf dicts — testable without cloud access;
``apply_storage_options`` sets them on the live session.
"""

from __future__ import annotations

from typing import Any, Mapping, Optional
from urllib.parse import urlparse

AZURE_SUFFIXES = (".blob.core.windows.net", ".dfs.core.windows.net")


def account_name_from_path(path: str) -> Optional[str]:
    """Extract the storage-account name from an Azure URL
    (parity: ``azure_helper.get_account_name_from_path``)."""
    if any(s in path for s in AZURE_SUFFIXES):
        host = urlparse(path).netloc.split("@")[-1]  # abfss://container@acct...
        return host.split(".")[0]
    return None


def normalize_azure_path(path: str) -> str:
    """``az://acct.blob.core.windows.net/container/p`` ->
    ``abfss://container@acct.dfs.core.windows.net/p``; plain ``az://``
    and ``abfss://`` paths pass through with scheme fixed for Spark."""
    up = urlparse(path)
    if up.scheme in ("abfss", "abfs", "wasbs", "wasb"):
        return path
    if up.scheme == "az":
        acct = account_name_from_path(path)
        if acct:
            container, _, rest = up.path.lstrip("/").partition("/")
            return f"abfss://{container}@{acct}.dfs.core.windows.net/{rest}"
        # az://container/path needs the account from storage_options
        container, _, rest = (up.netloc + up.path).lstrip("/").partition("/")
        return f"abfss://{container}@{{account_name}}.dfs.core.windows.net/{rest}"
    return path


def azure_confs(
    storage_options: Mapping[str, Any],
    account_name: Optional[str] = None,
) -> dict[str, str]:
    """Map the reference's Azure storage_options keys onto hadoop-azure
    (ABFS) configs.

    Supported keys (same surface as ``duckdb.py:223-312``):
    ``account_name``, ``account_key``, ``sas_token``,
    ``connection_string``, ``client_id``/``client_secret``/``tenant_id``
    (service principal), ``use_emulator``, ``chain``/``anon`` (token via
    azure-identity on the driver).
    """
    so = dict(storage_options)
    acct = so.get("account_name", account_name)
    confs: dict[str, str] = {}

    if str(so.get("use_emulator", "0")).lower() in ("1", "true"):
        acct = acct or "devstoreaccount1"
        confs[f"fs.azure.account.key.{acct}.dfs.core.windows.net"] = (
            "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq/K1SZFPTOtr/KBHBeksoGMGw=="
        )
        return confs

    if "connection_string" in so:
        for part in so["connection_string"].split(";"):
            k, _, v = part.partition("=")
            if k == "AccountName":
                acct = acct or v
            elif k == "AccountKey":
                so.setdefault("account_key", part.split("=", 1)[1])

    if not acct:
        raise ValueError("account_name required (directly, via URL, or connection string)")
    host = f"{acct}.dfs.core.windows.net"

    if "account_key" in so:
        confs[f"fs.azure.account.auth.type.{host}"] = "SharedKey"
        confs[f"fs.azure.account.key.{host}"] = so["account_key"]
    elif "sas_token" in so or "sas_url" in so:
        confs[f"fs.azure.account.auth.type.{host}"] = "SAS"
        confs[f"fs.azure.sas.token.provider.type.{host}"] = (
            "org.apache.hadoop.fs.azurebfs.sas.FixedSASTokenProvider"
        )
        confs[f"fs.azure.sas.fixed.token.{host}"] = so.get("sas_token", so.get("sas_url", ""))
    elif "client_id" in so and "client_secret" in so and "tenant_id" in so:
        confs[f"fs.azure.account.auth.type.{host}"] = "OAuth"
        confs[f"fs.azure.account.oauth.provider.type.{host}"] = (
            "org.apache.hadoop.fs.azurebfs.oauth2.ClientCredsTokenProvider"
        )
        confs[f"fs.azure.account.oauth2.client.id.{host}"] = so["client_id"]
        confs[f"fs.azure.account.oauth2.client.secret.{host}"] = so["client_secret"]
        confs[f"fs.azure.account.oauth2.client.endpoint.{host}"] = (
            f"https://login.microsoftonline.com/{so['tenant_id']}/oauth2/token"
        )
    elif "chain" in so or str(so.get("anon", "")).lower() in ("0", "false"):
        # driver-side azure-identity token (parity with
        # azure_helper._get_credential_from_chain); gated behind
        # import-try since azure-identity may be absent
        token = _token_from_chain(so.get("chain", "default"))
        confs[f"fs.azure.account.auth.type.{host}"] = "OAuth"
        confs[f"fs.azure.account.oauth.provider.type.{host}"] = (
            "org.apache.hadoop.fs.azurebfs.oauth2.FixedTokenProvider"
        )
        confs[f"fs.azure.account.oauth2.token.{host}"] = token
    return confs


def _token_from_chain(chain: str) -> str:
    try:
        from azure.identity import (
            AzureCliCredential,
            ChainedTokenCredential,
            DefaultAzureCredential,
            EnvironmentCredential,
            ManagedIdentityCredential,
        )
    except ImportError as exc:  # pragma: no cover
        raise ImportError(
            "credential-chain storage_options require the azure-identity package"
        ) from exc
    cred_map = {
        "cli": AzureCliCredential,
        "env": EnvironmentCredential,
        "managed_identity": ManagedIdentityCredential,
        "default": DefaultAzureCredential,
    }
    creds = [cred_map[c]() for c in chain.split(";")]
    cred = ChainedTokenCredential(*creds) if len(creds) > 1 else creds[0]
    return cred.get_token("https://storage.azure.com/.default").token


# the documented Azurite/devstore well-known key (public constant, same
# one the reference's test server uses)
AZURITE_WELL_KNOWN_KEY = (
    "Eby8vdM02xNOcqFlqUwJPLlmEtlCDXJ1OUzFT50uSRZ6IFsuFq2UVErCz4I6tq"
    "/K1SZFPTOtr/KBHBeksoGMGw=="
)


def azure_container_path(path: str) -> str:
    """Container-relative path (``container/rest``) for any Azure URI
    form — the shape ``pyarrow.fs.AzureFileSystem`` addresses (the
    account is its filesystem root)."""
    up = urlparse(path)
    if up.scheme in ("abfss", "abfs", "wasbs", "wasb"):
        container = up.netloc.split("@", 1)[0]
        return f"{container}/{up.path.lstrip('/')}".rstrip("/")
    if up.scheme == "az":
        if any(s in up.netloc for s in AZURE_SUFFIXES):
            # az://acct.blob.core.windows.net/container/rest
            return up.path.lstrip("/").rstrip("/")
        # az://container/rest
        return f"{up.netloc}/{up.path.lstrip('/')}".rstrip("/")
    raise ValueError(f"not an Azure URI: {path}")


def pyarrow_azure_fs(
    storage_options: Optional[Mapping[str, Any]] = None,
    account_name: Optional[str] = None,
):
    """``pyarrow.fs.AzureFileSystem`` from reference-dialect
    ``storage_options`` — the driver-side (metadata + deletion-vector)
    counterpart of ``azure_confs``'s executor-side Hadoop confs.

    Supported: ``account_name``/``account_key``; ``use_emulator``
    (devstore account + well-known key + ``blob_storage_authority`` /
    ``dfs_storage_authority`` endpoint overrides, defaulting to
    Azurite's 127.0.0.1:10000/10001, plain http — the exact surface
    the reference exercises against Azurite in tests/test_duckdb_az.py);
    anything else falls to the SDK's DefaultAzureCredential.  SAS and
    service-principal secrets are not representable in pyarrow's
    binding — pass ``storage_options={"filesystem": ...}`` for those.
    """
    import pyarrow.fs as pafs

    so = dict(storage_options or {})
    acct = so.get("account_name", account_name)
    if str(so.get("use_emulator", "0")).lower() in ("1", "true"):
        blob_auth = so.get("blob_storage_authority", "127.0.0.1:10000")
        return pafs.AzureFileSystem(
            account_name=acct or "devstoreaccount1",
            account_key=so.get("account_key", AZURITE_WELL_KNOWN_KEY),
            blob_storage_authority=blob_auth,
            dfs_storage_authority=so.get("dfs_storage_authority", blob_auth),
            blob_storage_scheme="http",
            dfs_storage_scheme="http",
        )
    if not acct:
        raise ValueError(
            "account_name required (directly, via URL, or storage_options)"
        )
    if "account_key" in so:
        return pafs.AzureFileSystem(
            account_name=acct, account_key=so["account_key"]
        )
    return pafs.AzureFileSystem(account_name=acct)


def s3_confs(storage_options: Mapping[str, Any]) -> dict[str, str]:
    """AWS storage_options -> fs.s3a.* (delta-rs key dialect)."""
    so = dict(storage_options)
    confs: dict[str, str] = {}
    if "AWS_ACCESS_KEY_ID" in so or "access_key_id" in so:
        confs["fs.s3a.access.key"] = so.get("AWS_ACCESS_KEY_ID", so.get("access_key_id"))
    if "AWS_SECRET_ACCESS_KEY" in so or "secret_access_key" in so:
        confs["fs.s3a.secret.key"] = so.get(
            "AWS_SECRET_ACCESS_KEY", so.get("secret_access_key")
        )
    if "AWS_SESSION_TOKEN" in so:
        confs["fs.s3a.session.token"] = so["AWS_SESSION_TOKEN"]
    if "AWS_ENDPOINT_URL" in so or "endpoint_url" in so:
        confs["fs.s3a.endpoint"] = so.get("AWS_ENDPOINT_URL", so.get("endpoint_url"))
        confs["fs.s3a.path.style.access"] = "true"
    if "AWS_REGION" in so or "region" in so:
        confs["fs.s3a.endpoint.region"] = so.get("AWS_REGION", so.get("region"))
    return confs


def storage_confs_for_path(
    path: str, storage_options: Optional[Mapping[str, Any]]
) -> tuple[str, dict[str, str]]:
    """(spark-readable path, hadoop confs) for a table URI + options."""
    if not storage_options:
        return path, {}
    scheme = urlparse(path).scheme
    if scheme in ("az", "abfs", "abfss", "wasb", "wasbs") or any(
        s in path for s in AZURE_SUFFIXES
    ):
        acct = account_name_from_path(path) or storage_options.get("account_name")
        new_path = normalize_azure_path(path)
        if "{account_name}" in new_path:
            if not acct:
                raise ValueError("cannot resolve account_name for " + path)
            new_path = new_path.format(account_name=acct)
        return new_path, azure_confs(storage_options, acct)
    if scheme in ("s3", "s3a"):
        return "s3a://" + path.split("://", 1)[1], s3_confs(storage_options)
    return path, {}


def apply_storage_options(
    spark, path: str, storage_options: Optional[Mapping[str, Any]]
) -> str:
    """Set the confs on the live session; returns the rewritten path."""
    new_path, confs = storage_confs_for_path(path, storage_options)
    for k, v in confs.items():
        spark.conf.set(f"spark.hadoop.{k}", v)
        spark._jsc.hadoopConfiguration().set(k, v)
    return new_path
