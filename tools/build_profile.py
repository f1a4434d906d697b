"""Per-gate driver-build vs execution split (warm session).

For each named gate, samples: clearCache + GC, then times
DataFrame CONSTRUCTION (``fn(spark, sf_dir)`` — includes eager persist
registration and any operator-side analysis calls) separately from the
count() action.  Min-of-N per phase.  Build time is inside the bench's
timed region, so a gate with a heavy build is a real bench cost.

Usage: python tools/build_profile.py <gate> [gate ...] [--sf <dir>] [--n N]
       python tools/build_profile.py --top 20        # slowest by BENCH_DETAIL
"""
from __future__ import annotations

import gc
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    argv = sys.argv[1:]
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    n_samples = 4
    names = []
    top = 0
    i = 0
    while i < len(argv):
        a = argv[i]
        if a == "--sf":
            sf_dir = argv[i + 1]; i += 2
        elif a == "--n":
            n_samples = int(argv[i + 1]); i += 2
        elif a == "--top":
            top = int(argv[i + 1]); i += 2
        else:
            names.append(a); i += 1

    import __spark_entry__ as entry
    from deltalake2db_spark import get_spark

    qs = entry.queries()
    if top:
        det = json.load(open(os.path.join(
            os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
            "BENCH_DETAIL.json")))
        mins: dict[str, float] = {}
        for dr in det["draws"]:
            for k, v in dr["spark_queries"].items():
                mins[k] = min(mins.get(k, 9e9), v)
        names = [k for k, _ in sorted(mins.items(), key=lambda kv: -kv[1])[:top]]

    spark = get_spark("build-profile")
    jvm_gc = spark.sparkContext._jvm.System.gc
    print(f"== build profile @ {sf_dir}, {n_samples} samples ==")
    print(f"{'gate':<28} {'build_min':>9} {'count_min':>9} {'total_min':>9}  build%")
    for name in names:
        fn = qs[name]
        # one warm pass (JIT + codegen) before the measured samples
        try:
            spark.catalog.clearCache()
            fn(spark, sf_dir).count()
        except Exception as exc:
            print(f"{name:<28} FAILED warmup: {exc}")
            continue
        builds, counts, totals = [], [], []
        for _ in range(n_samples):
            spark.catalog.clearCache()
            gc.collect()
            jvm_gc()
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            t1 = time.perf_counter()
            df.count()
            t2 = time.perf_counter()
            builds.append(t1 - t0)
            counts.append(t2 - t1)
            totals.append(t2 - t0)
        b, c, t = min(builds), min(counts), min(totals)
        print(f"{name:<28} {b:9.3f} {c:9.3f} {t:9.3f}  {100*b/max(t,1e-9):5.1f}%"
              f"   [{'/'.join(f'{x:.2f}' for x in totals)}]")


if __name__ == "__main__":
    main()
