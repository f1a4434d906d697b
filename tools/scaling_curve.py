"""Scale-up evidence: time representative queries across the three
driver-generated scale factors (sf0.001 -> sf0.01 -> sf0.1, a 100x
input span) and report each query's growth factor per 10x of data.

A query whose cost is dominated by the per-query scheduling floor
shows a growth factor near 1x (flat in input size); a query doing
real data work shows near-linear growth (~10x per 10x step would be
proportional; LSH/banded pipelines grow sub-linearly until candidate
volume dominates).  This is the measurement behind SCALE.md's claim
that the bench's toy-query gap is a fixed floor that amortizes at the
100 TB design point, not hidden superlinear work.

Usage::

    python tools/scaling_curve.py [query ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

DEFAULT = [
    # heavy family — real data work, growth expected
    "q_minhash_lsh",
    "q_cross_dedup",
    "q_jaccard_pairs",
    "q_simhash_pairs",
    "q_chunk_dedup",
    "q_contamination",
    "q_semantic_dedup",
    "q_dedup_exact",
    # toy family — floor-dominated, expected ~flat
    "q1_pricing_summary",
    "q_rollup_orders",
    "q_text_stats",
    "q_events_hourly",
    "q_quantized_topk",
]

SFS = ["0.001", "0.01", "0.1"]


def main() -> None:
    import __spark_entry__ as entry
    from deltalake2db_spark import get_spark

    names = sys.argv[1:] or DEFAULT
    spark = get_spark("scaling")
    qs = entry.queries()

    # warm every (query, sf) pair once so JIT/codegen is steady state
    for sf in SFS:
        for n in names:
            try:
                qs[n](spark, f"/root/testdata/sf{sf}").count()
            except Exception as exc:
                print(f"# warm {n}@{sf} failed: {exc}", file=sys.stderr)

    rows = []
    failed = []
    for n in names:
        times = []
        try:
            for sf in SFS:
                best = float("inf")
                for _ in range(2):
                    spark.catalog.clearCache()
                    t0 = time.perf_counter()
                    qs[n](spark, f"/root/testdata/sf{sf}").count()
                    best = min(best, time.perf_counter() - t0)
                times.append(best)
        except Exception as exc:
            # keep every measurement already taken; a broken query must
            # not abort the whole curve
            print(f"# {n} failed at sf{sf}: {exc}", file=sys.stderr)
            failed.append(n)
            continue
        g1 = times[1] / times[0] if times[0] > 0 else float("nan")
        g2 = times[2] / times[1] if times[1] > 0 else float("nan")
        rows.append((n, times, g1, g2))
        print(
            f"{n:24s} sf0.001={times[0]:6.2f}s sf0.01={times[1]:6.2f}s "
            f"sf0.1={times[2]:6.2f}s   x10 growth: {g1:4.1f}x, {g2:4.1f}x"
        )

    flat = [r for r in rows if r[3] < 2.0]
    work = [r for r in rows if r[3] >= 2.0]
    print(
        f"\nfloor-dominated at sf0.1 (last 10x step < 2x): "
        f"{[r[0] for r in flat]}"
    )
    print(f"data-dominated (last 10x step >= 2x): {[r[0] for r in work]}")
    other = [
        r[0] for r in rows if not (r[3] < 2.0) and not (r[3] >= 2.0)
    ]  # NaN growth: query ran but a step measured 0/failed to divide
    if other or failed:
        print(f"unmeasured (failed or NaN growth): {other + failed}")


if __name__ == "__main__":
    main()
