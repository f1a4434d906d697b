"""Matrix-test session/materialization variants on the toy-query floor.

Each variant runs in its own process (fresh JVM): AQE on/off, shuffle
partitions, count() vs collect() materialization.  Prints per-variant
totals over the toy set.

Usage:
  python tools/floor_matrix.py            # parent: run all variants
  python tools/floor_matrix.py VARIANT    # child: one variant
"""
from __future__ import annotations

import json
import os
import subprocess
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

VARIANTS = {
    # name: (aqe, shuffle_partitions, materialize)
    "aqe_shuf32_count": ("true", "32", "count"),
    "aqe_shuf32_collect": ("true", "32", "collect"),
    "noaqe_shuf32_collect": ("false", "32", "collect"),
    "noaqe_shuf8_collect": ("false", "8", "collect"),
    "noaqe_shuf8_count": ("false", "8", "count"),
    "aqe_shuf8_collect": ("true", "8", "collect"),
}

# every oracle-covered query whose DuckDB time is < 0.1 s (the floor set),
# representative subset to keep the matrix affordable
TOYS = [
    "q1_pricing_summary", "q3_top_orders", "q5_nation_revenue",
    "q6_revenue_filter", "q_window_top_customers", "q_semi_high_quantity",
    "q_anti_low_spenders", "q_setop_returning_customers", "q_rollup_orders",
    "q_cube_orders", "q_string_funcs", "q_date_parts", "q_quantiles",
    "q_distinct_counts", "q_grouping_sets", "q_json_props",
    "q_hash_sample", "q_domain_mix", "q_shard_stats", "q_pack_sequences",
    "q_delta_history", "q_media_features", "q_delta_time_travel",
    "q_dedup_exact", "q_salted_agg",
]


def child(variant: str) -> None:
    aqe, shuf, mat = VARIANTS[variant]
    from pyspark.sql import SparkSession

    b = (
        SparkSession.builder.master("local[32]")
        .appName(f"matrix-{variant}")
        .config("spark.sql.shuffle.partitions", shuf)
        .config("spark.sql.adaptive.enabled", aqe)
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.parallelismFirst", "false")
        .config("spark.sql.adaptive.advisoryPartitionSizeInBytes", "4MB")
        .config("spark.locality.wait", "0")
        .config("spark.ui.enabled", "false")
        .config("spark.sql.codegen.cache.maxEntries", "2000")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", "32g")
    )
    spark = b.getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entry

    qs = entry.queries()
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

    def run(name: str) -> None:
        df = qs[name](spark, sf_dir)
        if mat == "count":
            df.count()
        else:
            df.collect()

    for name in TOYS:  # warm
        run(name)
    out = {}
    for name in TOYS:
        runs = []
        for _ in range(3):
            t0 = time.perf_counter()
            run(name)
            runs.append(time.perf_counter() - t0)
        out[name] = round(min(runs), 4)
    print(json.dumps({"variant": variant, "total": round(sum(out.values()), 3),
                      "queries": out}))


def main() -> None:
    if len(sys.argv) > 1:
        child(sys.argv[1])
        return
    results = {}
    for variant in VARIANTS:
        proc = subprocess.run(
            [sys.executable, os.path.abspath(__file__), variant],
            capture_output=True, text=True, env=os.environ,
        )
        line = [l for l in proc.stdout.splitlines() if l.startswith("{")]
        if line:
            r = json.loads(line[-1])
            results[variant] = r
            print(f"{variant:24s} total={r['total']:.2f}s")
        else:
            print(f"{variant:24s} FAILED\n{proc.stderr[-500:]}")
    if results:
        base = results.get("aqe_shuf32_count")
        if base:
            print("\nper-query vs base (aqe_shuf32_count):")
            for name in TOYS:
                row = " ".join(
                    f"{results[v]['queries'].get(name, -1):.2f}"
                    for v in VARIANTS if v in results
                )
                print(f"{name:30s} {row}")
            print("variants: " + " ".join(v for v in VARIANTS if v in results))


if __name__ == "__main__":
    main()
