"""A/B: q_bm25_topk (and the tokenize-heavy friends) at spread_scan
widths 8/16/32 — r15 VERDICT item 4 suspects the 32-way spread of a
4-partition source amplifies the per-task floor at sf0.1.  Warm
session, clearCache + GC between samples, interleaved rounds.

Usage: python tools/ab_bm25_width.py [rounds] [gate ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from deltalake2db_spark import get_spark  # noqa: E402


def main() -> None:
    rounds = int(sys.argv[1]) if len(sys.argv) > 1 else 4
    gates = sys.argv[2:] or ["q_bm25_topk"]
    import __spark_entry__ as entry
    from deltalake2db_spark.operators import parallel as par

    spark = get_spark("ab_bm25_width")
    qs = entry.queries()
    sf_dir = "/root/testdata/sf0.1"

    orig = par.spread_scan

    def spread_at(width):
        def patched(df, min_ratio=4, chain_depth=1):
            if width is None:
                return orig(df, min_ratio, chain_depth)
            if df.rdd.getNumPartitions() * min_ratio <= width:
                return df.repartition(width)
            return df

        return patched

    results: dict[str, list[float]] = {}
    for _ in range(rounds):
        for w in (8, 16, 32):
            par.spread_scan = spread_at(w)
            for g in gates:
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                t0 = time.perf_counter()
                qs[g](spark, sf_dir).count()
                dt = time.perf_counter() - t0
                results.setdefault(f"{g}@w{w}", []).append(dt)
    par.spread_scan = orig
    for k in sorted(results):
        v = sorted(results[k])
        print(f"{k}: min {v[0]:.3f} med {v[len(v)//2]:.3f} all "
              + "/".join(f"{x:.2f}" for x in v))


if __name__ == "__main__":
    main()
