"""SparkSession factory pinned to the harness semantics.

UTC session timezone makes Delta ``timestamp`` (UTC-instant, the
reference maps it to DuckDB TIMESTAMPTZ — ``deltalake2db/duckdb.py:322``)
collect identically to the oracle.

Two sizing profiles (``SPARK_GRAFT_PROFILE`` or the ``profile=`` arg):

``local`` (default) — sized for sub-GB inputs on a single machine.
    Adaptive query execution is OFF: with AQE on, every exchange becomes
    its own job (materialize map stage -> re-plan -> next job), and on
    this class of input the ~50-65 ms per-job scheduling floor costs far
    more than runtime re-planning saves.  Measured on the full gate set
    at sf0.1 (fresh JVM per variant, best-of-2 per query): the 12
    heaviest pipelines total 20.5-21.0 s with AQE off + 8 shuffle
    partitions vs 25.0 s with AQE on + 32 (minhash-LSH 5.0 vs 6.0 s,
    cross-corpus dedup 4.7 vs 6.8 s), and the scan-task caps
    (``files.minPartitionNum=4``) stop 32-way splits of single-MB files
    (3.5 ms/task launch overhead, measured).  Skew handling at this
    scale comes from the operators themselves (explicit salting, skew
    caps, banded candidate generation), not runtime re-planning.

``cluster`` — the 100 TB design point.  AQE ON (runtime coalescing,
    skew-join splitting, dynamic join strategy all pay for themselves
    once shuffles carry GBs per partition), 200 initial shuffle
    partitions (deployments should raise via spark.sql.shuffle.partitions
    to ~2-3x total cores), 64 MB advisory partition size.  Per-job
    scheduling overhead is noise when stages run minutes.

The operators are profile-agnostic: they declare plans (explicit
``broadcast()`` on small sides, salting on skewed keys, banded/bucketed
candidate generation) that are correct and shuffle-minimal under either
profile.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession


def get_spark(
    app_name: str = "deltalake2db_spark",
    cpus: int | None = None,
    profile: str | None = None,
) -> SparkSession:
    if cpus is None:
        cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    profile = profile or os.environ.get("SPARK_GRAFT_PROFILE", "local")
    if profile not in ("local", "cluster"):
        raise ValueError(f"unknown profile {profile!r}: expected 'local' or 'cluster'")
    small = profile == "local"
    builder = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(app_name)
        .config("spark.sql.shuffle.partitions", "8" if small else "200")
        .config("spark.sql.adaptive.enabled", "false" if small else "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        # respect the advisory size when coalescing instead of keeping
        # max parallelism: small shuffles collapse to a few tasks and
        # stop paying per-task scheduling overhead (the Spark-recommended
        # production setting; default true is back-compat only)
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config(
            "spark.sql.adaptive.advisoryPartitionSizeInBytes",
            os.environ.get("SPARK_GRAFT_ADVISORY", "4MB" if small else "64MB"),
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
        # SPARK_GRAFT_EXTRA_JAVA_OPTS appends measurement flags (GC /
        # JIT logging for diagnosing whole-JVM bad modes) without
        # editing this file; empty by default, so production sessions
        # are unchanged.
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:TypeProfileWidth=8"
            " -XX:-DontCompileHugeMethods"
            + (
                " " + os.environ["SPARK_GRAFT_EXTRA_JAVA_OPTS"]
                if os.environ.get("SPARK_GRAFT_EXTRA_JAVA_OPTS")
                else ""
            ),
        )
        # PySpark 4 wraps every DataFrame API call to capture a Python
        # call site for error enrichment: 2 extra Py4J round trips
        # (conf.get + PySparkCurrentOrigin.set) plus a stack walk PER
        # CALL.  Driver-side plan construction is a measured 25-75% of
        # the expression-heavy gates (minhash builds 64 hash trees),
        # and this flag alone cut q_minhash_lsh 1.97->1.57 s and
        # q_cross_dedup 2.01->1.77 s at sf0.1 (paired A/B, fresh JVMs).
        # Static conf - only settable here.  Costs nothing but
        # call-site lines in error messages.
        .config("spark.python.sql.dataFrameDebugging.enabled", "false")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        # delta-ecosystem convention: data files carry INT64 micros, not
        # the deprecated INT96 (which pyarrow reads back as ns — any
        # storage-reinterpreting reader would be off by 1000x)
        .config("spark.sql.parquet.outputTimestampType", "TIMESTAMP_MICROS")
        .config("spark.sql.parquet.int96RebaseModeInRead", "CORRECTED")
        .config("spark.sql.parquet.datetimeRebaseModeInRead", "CORRECTED")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEMORY", "48g"))
        .config("spark.sql.warehouse.dir", "/tmp/dl2db_warehouse")
    )
    if small:
        # don't split single-MB parquet files into defaultParallelism
        # (=cpus) scan tasks: each task launch costs ~3.5ms and the
        # mapInPandas/Arrow stages downstream inherit the split count.
        # 4 keeps small-corpus Python stages parallel without paying
        # 32 launches per trivial scan; real multi-file tables ignore
        # this floor (size-based splitting takes over past
        # maxPartitionBytes).
        builder = builder.config("spark.sql.files.minPartitionNum", "4").config(
            "spark.sql.leafNodeDefaultParallelism", "4"
        ).config(
            # parallelize/range/createDataFrame default to
            # sparkContext.defaultParallelism (= cores), which
            # leafNodeDefaultParallelism does NOT override — so every
            # driver-localized frame (lineage cuts, literal models) and
            # every spark.range source ran 32 trivial tasks (measured:
            # the media pipelines dropped 0.61 -> 0.42 s at sf0.1 with
            # 8).  SQL scan/shuffle sizing is governed by the confs
            # above, not this.
            "spark.default.parallelism", "8"
        )
    else:
        # the skew-join splitter is the cluster-scale half of what the
        # operators' explicit salting does locally
        builder = builder.config("spark.sql.adaptive.skewJoin.enabled", "true")
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
