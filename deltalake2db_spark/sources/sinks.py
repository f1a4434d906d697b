"""Database sinks — the "Delta Lake to database" direction of the
connector (north star: DataFrame read Delta + JDBC sink).

``delta_to_jdbc`` is the cluster path: scan -> repartition to the
target's write concurrency -> ``df.write.jdbc`` (one connection per
partition, batched inserts).  No JDBC driver ships in this container,
so its test asserts option assembly and the driver-missing error.

``delta_to_duckdb`` is a fully-testable embedded sink: Spark stages the
scan as parquet (distributed write), DuckDB ingests with a single
zero-copy ``read_parquet`` CTAS/INSERT — the pattern for bulk-loading
any parquet-capable warehouse without row-at-a-time inserts.
"""

from __future__ import annotations

import os
import tempfile
from typing import Any, Mapping, Optional

from pyspark.sql import DataFrame, SparkSession

from .delta import PathOrState, scan_delta


def delta_to_jdbc(
    spark: SparkSession,
    table: PathOrState,
    url: str,
    target_table: str,
    mode: str = "append",
    write_partitions: int = 8,
    batchsize: int = 10_000,
    jdbc_options: Optional[Mapping[str, Any]] = None,
    **scan_kwargs: Any,
) -> None:
    """Delta table -> JDBC target.

    ``write_partitions`` bounds concurrent connections (each Spark
    partition opens one); ``batchsize`` controls rows per executeBatch.
    """
    df = scan_delta(spark, table, **scan_kwargs)
    writer = (
        df.repartition(write_partitions)
        .write.mode(mode)
        .format("jdbc")
        .option("url", url)
        .option("dbtable", target_table)
        .option("batchsize", str(batchsize))
        .option("isolationLevel", "READ_COMMITTED")
    )
    for k, v in (jdbc_options or {}).items():
        writer = writer.option(k, str(v))
    writer.save()


def dataframe_to_duckdb(
    df: DataFrame,
    db_path: str,
    target_table: str,
    mode: str = "overwrite",
    staging_dir: Optional[str] = None,
) -> int:
    """Any DataFrame -> a DuckDB database file via parquet staging.

    Returns the row count ingested.  Staging is a distributed Spark
    write; ingestion is one columnar ``read_parquet`` statement —
    no per-row Python, no JDBC round trips.
    """
    import duckdb

    staging = staging_dir or tempfile.mkdtemp(prefix="dl2db_sink_")
    out = os.path.join(staging, "stage.parquet")
    df.write.mode("overwrite").parquet(out)
    glob = os.path.join(out, "*.parquet")
    con = duckdb.connect(db_path)
    try:
        if '"' in target_table:
            raise ValueError("table name must not contain quotes")
        if mode == "overwrite":
            con.execute(f'DROP TABLE IF EXISTS "{target_table}"')
            con.execute(
                f'CREATE TABLE "{target_table}" AS SELECT * FROM read_parquet(?)',
                [glob],
            )
        elif mode == "append":
            con.execute(
                f'INSERT INTO "{target_table}" SELECT * FROM read_parquet(?)',
                [glob],
            )
        else:
            raise ValueError(f"unsupported mode: {mode}")
        (n,) = con.execute(f'SELECT count(*) FROM "{target_table}"').fetchone()
        return int(n)
    finally:
        con.close()


def delta_to_duckdb(
    spark: SparkSession,
    table: PathOrState,
    db_path: str,
    target_table: str,
    mode: str = "overwrite",
    **scan_kwargs: Any,
) -> int:
    """Delta table -> DuckDB database file (protocol-correct scan +
    bulk columnar load)."""
    df = scan_delta(spark, table, **scan_kwargs)
    return dataframe_to_duckdb(df, db_path, target_table, mode=mode)
