"""Probe the q_minhash_lsh bimodality (2.5 s vs 15 s in identical fresh
JVMs).  Runs ONE measured pass in this JVM with an optional conf
override, prints {"variant": ..., "warm": s, "t": s}.

Usage: python tools/bimodal_probe.py VARIANT
"""
from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS: dict[str, dict[str, str]] = {
    "base": {},
    "nocodegen": {"spark.sql.codegen.wholeStage": "false"},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "serialgc": {},  # handled via java opts below
    "c1only": {},    # TieredStopAtLevel=1
}

JAVA_EXTRA = {
    "serialgc": " -XX:+UseSerialGC",
    "c1only": " -XX:TieredStopAtLevel=1",
}


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    from pyspark.sql import SparkSession

    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "0")) or os.cpu_count() or 4
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"probe-{variant}")
        .config("spark.sql.shuffle.partitions", str(max(cpus, 8)))
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
        .config("spark.locality.wait", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config(
            "spark.driver.extraJavaOptions",
            "-XX:ReservedCodeCacheSize=1g -XX:TypeProfileWidth=8"
            " -XX:-DontCompileHugeMethods" + JAVA_EXTRA.get(variant, ""),
        )
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
    )
    for k, v in VARIANTS[variant].items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as entry

    fn = entry.queries()["q_minhash_lsh"]
    t0 = time.perf_counter()
    fn(spark, "/root/testdata/sf0.001").count()
    warm = round(time.perf_counter() - t0, 2)
    spark.catalog.clearCache()
    spark.sparkContext._jvm.System.gc()
    t0 = time.perf_counter()
    fn(spark, os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")).count()
    t = round(time.perf_counter() - t0, 2)
    print(json.dumps({"variant": variant, "warm": warm, "t": t}))


if __name__ == "__main__":
    main()
