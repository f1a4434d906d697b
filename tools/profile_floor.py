"""Profile the per-query floor on toy queries under conf variants.

Usage: python tools/profile_floor.py VARIANT
Variants tweak one suspected floor component at a time; each run is a
fresh JVM so variants don't contaminate each other.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import SparkSession

VARIANTS = {
    "base": {},
    "noaqe": {"spark.sql.adaptive.enabled": "false"},
    "leaf1": {
        "spark.sql.files.minPartitionNum": "1",
        "spark.sql.leafNodeDefaultParallelism": "1",
    },
    "noaqe_leaf1": {
        "spark.sql.adaptive.enabled": "false",
        "spark.sql.files.minPartitionNum": "1",
        "spark.sql.leafNodeDefaultParallelism": "1",
    },
    "shuf4": {"spark.sql.shuffle.partitions": "4"},
    "opencost32": {"spark.sql.files.openCostInBytes": "33554432"},
}

TOY = [
    "q6_revenue_filter",
    "q1_pricing_summary",
    "q_string_funcs",
    "q_date_parts",
    "q_json_props",
    "q_distinct_counts",
    "q_rollup_orders",
    "q_window_top_customers",
]


def main() -> None:
    variant = sys.argv[1] if len(sys.argv) > 1 else "base"
    extra = VARIANTS[variant]
    cpus = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))
    b = (
        SparkSession.builder.master(f"local[{cpus}]")
        .appName(f"floor-{variant}")
        .config("spark.sql.shuffle.partitions", "32")
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
        .config("spark.locality.wait", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "48g")
    )
    for k, v in extra.items():
        b = b.config(k, v)
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")

    import __spark_entry__ as entry

    qs = entry.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    # warm
    for name in TOY:
        qs[name](spark, sf_dir).count()

    total = 0.0
    for name in TOY:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            qs[name](spark, sf_dir).count()
            runs.append(time.perf_counter() - t0)
        best = min(runs)
        total += best
        print(f"{variant:12s} {name:28s} {best*1000:7.1f} ms  {[round(r*1000) for r in runs]}")
    print(f"{variant:12s} TOTAL {total*1000:.0f} ms")


if __name__ == "__main__":
    main()
