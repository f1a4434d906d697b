"""SparkSession factory pinned to the harness semantics.

UTC session timezone makes Delta ``timestamp`` (UTC-instant, the
reference maps it to DuckDB TIMESTAMPTZ — ``deltalake2db/duckdb.py:322``)
collect identically to the oracle; AQE handles runtime re-planning and
skew at scale.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(app_name: str = "deltalake2db_spark", cpus: int | None = None) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory size when coalescing instead of keeping
        # max parallelism: small shuffles collapse to a few tasks and
        # stop paying per-task scheduling overhead (the Spark-recommended
        # production setting; default true is back-compat only)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        # 4MB suits local[32]/sf0.1 bench scale — cluster deployments at
        # 100 TB should raise to 64-256MB via SPARK_GRAFT_ADVISORY
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "4MB"),
        )
        # local mode: every task is process-local; never wait for locality
        .config("spark.locality.wait", "0")
        # the UI's event-bus posting costs ~40ms/job at interactive
        # scale; headless analytics sessions don't need it
        .config("spark.ui.enabled", "false")
        # many distinct query shapes share one session; the default
        # 100-entry whole-stage-codegen class cache evicts hot plans and
        # re-JITs them every run (measured: the big inverted-index join
        # doubled in wall-clock once ~39 queries shared the JVM)
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        # dozens of distinct generated classes flow through shared JVM
        # call sites (codegen iterators, shuffle writers); the default
        # 240MB code cache flushes hot methods mid-session and the
        # default TypeProfileWidth=2 lets an early query make a shared
        # call site megamorphic for every later query (measured: the
        # inverted-index join ran a stable 2x slower after 30 other
        # queries; these two flags recover isolated-run speed).
        # -DontCompileHugeMethods: wide aggregates (e.g. 64 minhash
        # mins) generate >8KB-bytecode methods HotSpot otherwise
        # refuses to JIT — they ran interpreted forever in some
        # sessions (measured bimodal 1.7s vs 5.4s for the same query)
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:TypeProfileWidth=8"
            " -XX:-DontCompileHugeMethods",
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # delta-ecosystem convention: data files carry INT64 micros, not
        # the deprecated INT96 (which pyarrow reads back as ns — any
        # storage-reinterpreting reader would be off by 1000x)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.ui.enabled", "false")
        .config("spark.sql.warehouse.dir", "/tmp/dl2db_warehouse")
    )
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
