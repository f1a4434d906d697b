"""Attribute the per-query scheduling floor on toy queries.

For each representative toy gate, split wall time into:
  build_ms  — Python-side DataFrame construction (py4j + any driver-side
              delta-log work inside the query function)
  plan_ms   — Catalyst analyze+optimize+physical planning (forcing
              queryExecution.executedPlan without running a job)
  exec_ms   — job execution (the remaining .count() time)
and count jobs/stages/tasks via the status tracker with job groups.

Usage: python tools/floor_attrib.py [sf_dir]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TOY = [
    "q6_revenue_filter",
    "q1_pricing_summary",
    "q_string_funcs",
    "q_date_parts",
    "q_json_props",
    "q_distinct_counts",
    "q_rollup_orders",
    "q_window_top_customers",
    "q_shard_stats",
    "q_hash_sample",
    "q_domain_mix",
    "q_delta_time_travel",
    "q_delta_history",
    "q_pack_sequences",
    "q_media_features",
]


def main() -> None:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from deltalake2db_spark import get_spark

    import __spark_entry__ as entry

    spark = get_spark("floor-attrib")
    sc = spark.sparkContext
    qs = entry.queries()

    # warm every path once
    for name in TOY:
        qs[name](spark, sf_dir).count()

    print(f"{'query':30s} {'build':>7s} {'plan':>7s} {'exec':>7s} "
          f"{'total':>7s} {'jobs':>4s} {'tasks':>5s}")
    tot = dict(build=0.0, plan=0.0, exec=0.0)
    for name in TOY:
        best = None
        for _ in range(3):
            t0 = time.perf_counter()
            df = qs[name](spark, sf_dir)
            t1 = time.perf_counter()
            # force full planning without execution
            df._jdf.queryExecution().executedPlan()
            t2 = time.perf_counter()
            group = f"attrib-{name}-{t0}"
            sc.setJobGroup(group, name)
            df.count()
            t3 = time.perf_counter()
            sc.setJobGroup("", "")
            jids = sc.statusTracker().getJobIdsForGroup(group)
            ntasks = 0
            for j in jids:
                ji = sc.statusTracker().getJobInfo(j)
                if ji:
                    for s in ji.stageIds:
                        si = sc.statusTracker().getStageInfo(s)
                        if si:
                            ntasks += si.numTasks
            row = (t1 - t0, t2 - t1, t3 - t2, t3 - t0, len(jids), ntasks)
            if best is None or row[3] < best[3]:
                best = row
        b, p, e, t, nj, nt = best
        tot["build"] += b
        tot["plan"] += p
        tot["exec"] += e
        print(f"{name:30s} {b*1000:7.1f} {p*1000:7.1f} {e*1000:7.1f} "
              f"{t*1000:7.1f} {nj:4d} {nt:5d}")
    print(f"{'TOTAL':30s} {tot['build']*1000:7.1f} {tot['plan']*1000:7.1f} "
          f"{tot['exec']*1000:7.1f}")


if __name__ == "__main__":
    main()
