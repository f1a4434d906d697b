"""Dump `.explain("formatted")` for every declared query to
plans/r16/<name>_<suffix>.txt (optimization-round plan evidence).

Usage: python tools/dump_plans_r16.py <suffix> [query ...]
       (suffix = "before" | "after"; default all queries)

Also prints a one-line plan-shape summary per query: #Exchange,
join strategies, Python-eval nodes, PushedFilters presence.
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, "/root/repo")


def main() -> int:
    suffix = sys.argv[1] if len(sys.argv) > 1 else "before"
    only = set(sys.argv[2:])

    import __spark_entry__ as entry
    from deltalake2db_spark import get_spark

    spark = get_spark("plan-dump")
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    out_dir = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "plans", "r16")
    os.makedirs(out_dir, exist_ok=True)

    qs = entry.queries()
    for name, fn in qs.items():
        if only and name not in only:
            continue
        try:
            df = fn(spark, sf_dir)
            txt = spark._jvm.PythonSQLUtils.explainString(
                df._jdf.queryExecution(), "formatted"
            )
        except Exception as exc:  # noqa: BLE001
            txt = f"PLAN DUMP FAILED: {exc}"
        with open(os.path.join(out_dir, f"{name}_{suffix}.txt"), "w") as fh:
            fh.write(txt)
        n_ex = len(re.findall(r"\bExchange\b", txt))
        joins = sorted(set(re.findall(
            r"(BroadcastHashJoin|SortMergeJoin|ShuffledHashJoin|"
            r"BroadcastNestedLoopJoin|CartesianProduct)", txt)))
        pyev = sorted(set(re.findall(
            r"(BatchEvalPython|ArrowEvalPython|MapInPandas|"
            r"MapInArrow|FlatMapGroupsInPandas)", txt)))
        pushed = "PushedFilters: [" in txt and not re.search(
            r"PushedFilters: \[\]", txt)
        print(f"{name}: exchanges={n_ex} joins={joins} py={pyev} "
              f"pushed_filters={pushed}")
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
