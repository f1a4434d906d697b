"""Local mirror of the driver's t2 correctness gate.

Runs every ``__spark_entry__.queries()`` entry at the given sf_dir,
runs the matching ``oracle_sql()`` in DuckDB over the same parquet
views, and compares row count, column names, and order-insensitive
values.  Usage::

    python tools/check_correctness.py [sf_dir] [query ...]
"""

from __future__ import annotations

import math
import sys
import time

sys.path.insert(0, "/root/repo")


def norm_value(v):
    if v is None:
        return "NULL"
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        if v == int(v) and abs(v) < 1e15:
            return str(int(v))
        return f"{v:.6f}".rstrip("0")
    if isinstance(v, bool):
        return str(v).lower()
    return str(v)


def frame_signature(cols, rows):
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = []
    for r in rows:
        vals = list(r)
        out.append("|".join(norm_value(vals[i]) for i in order))
    out.sort()
    return sorted(cols), out


def main():
    argv = list(sys.argv[1:])
    json_out = None
    if "--json" in argv:
        i = argv.index("--json")
        json_out = argv[i + 1]
        del argv[i : i + 2]
    sf_dir = argv[0] if argv else "/root/testdata/sf0.01"
    only = set(argv[1:])

    import duckdb

    import __spark_entry__ as entry
    from deltalake2db_spark import get_spark

    spark = get_spark("correctness_check", cpus=16)
    con = duckdb.connect()
    for t in ["region", "nation", "customer", "supplier", "part", "orders",
              "lineitem", "events", "documents", "embeddings"]:
        con.sql(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')")

    qs = entry.queries()
    oracles = entry.oracle_sql()
    n_pass = n_fail = 0
    results = {}
    for name, fn in qs.items():
        if only and name not in only:
            continue
        t0 = time.time()
        try:
            sdf = fn(spark, sf_dir)
            srows = sdf.collect()
            scols = sdf.columns
        except Exception as e:
            print(f"FAIL {name}: spark error: {e}")
            results[name] = {"status": "FAIL", "err": f"spark: {e}"[:300]}
            n_fail += 1
            continue
        spark_t = time.time() - t0
        if name not in oracles:
            print(f"ROWS-ONLY {name}: {len(srows)} rows, {spark_t:.1f}s")
            results[name] = {
                "status": "ROWS-ONLY", "rows": len(srows),
                "spark_sec": round(spark_t, 2),
            }
            continue
        try:
            rel = con.sql(oracles[name])
            ocols = [c for c in rel.columns]
            orows = rel.fetchall()
        except Exception as e:
            print(f"FAIL {name}: oracle error: {e}")
            results[name] = {"status": "FAIL", "err": f"oracle: {e}"[:300]}
            n_fail += 1
            continue
        sc, ss = frame_signature(scols, [tuple(r) for r in srows])
        oc, os_ = frame_signature(ocols, orows)
        ok = True
        if sc != oc:
            print(f"FAIL {name}: columns differ spark={sc} oracle={oc}")
            ok = False
        elif len(ss) != len(os_):
            print(f"FAIL {name}: rowcount spark={len(ss)} oracle={len(os_)}")
            ok = False
        elif ss != os_:
            bad = [(a, b) for a, b in zip(ss, os_) if a != b][:3]
            print(f"FAIL {name}: values differ, first diffs: {bad}")
            ok = False
        if ok:
            print(f"PASS {name}: {len(ss)} rows, spark {spark_t:.1f}s")
            n_pass += 1
        else:
            n_fail += 1
        results[name] = {
            "status": "PASS" if ok else "FAIL",
            "rows": len(ss), "oracle_rows": len(os_),
            "spark_sec": round(spark_t, 2),
        }
    print(f"\n{n_pass} pass, {n_fail} fail")
    if json_out:
        import json

        with open(json_out, "w") as f:
            json.dump(
                {"sf_dir": sf_dir, "n_pass": n_pass, "n_fail": n_fail,
                 "n_gates": len(results), "gates": results},
                f, indent=1, sort_keys=True,
            )
        print(f"wrote {json_out}")
    return 1 if n_fail else 0


if __name__ == "__main__":
    sys.exit(main())
