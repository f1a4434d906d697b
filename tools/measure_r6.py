"""Round-6 micro-measurements: chunk-dedup winner strategies and the
minhash-LSH r4->r5 regression.  Fresh JVM, bench-identical session conf.

Usage: python tools/measure_r6.py [chunk|minhash|all]
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from deltalake2db_spark import get_spark  # noqa: E402


def _docs_with_planted(spark, sf_dir):
    import __spark_entry__ as entry
    from pyspark.sql import functions as F

    d = entry._t(spark, sf_dir, "documents").select("doc_id", "text")
    words = F.split(
        F.regexp_replace(F.lower(F.trim(F.col("text"))), "\\s+", " "), " "
    )
    planted = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.concat(
            F.concat_ws(" ", F.slice(words, 1, 8)),
            F.lit(" zz"),
            F.col("doc_id"),
        ).alias("text"),
    )
    return d.unionByName(planted)


def measure_chunk(spark, sf_dir):
    from deltalake2db_spark.operators import dedup as D

    src = _docs_with_planted(spark, sf_dir)
    est = int(src._jdf.queryExecution().optimizedPlan().stats().sizeInBytes())
    print(f"optimizer size estimate: {est:,} bytes", file=sys.stderr)
    out = {"est_bytes": est}
    for winner in ("window", "join"):
        # warm
        D.dedup_chunks(_docs_with_planted(spark, "/root/testdata/sf0.001"),
                       chunk_words=8, winner=winner).count()
        runs = []
        for _ in range(3):
            spark.catalog.clearCache()
            t0 = time.perf_counter()
            n = D.dedup_chunks(src, chunk_words=8, winner=winner).count()
            runs.append(round(time.perf_counter() - t0, 3))
        out[winner] = {"rows": n, "runs": runs, "best": min(runs)}
        print(f"chunk_dedup winner={winner}: {runs} rows={n}", file=sys.stderr)
    return out


def measure_minhash(spark, sf_dir):
    import __spark_entry__ as entry

    qs = entry.queries()
    fn = qs["q_minhash_lsh"]
    fn(spark, "/root/testdata/sf0.001").count()  # warm
    runs = []
    for _ in range(4):
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        n = fn(spark, sf_dir).count()
        runs.append(round(time.perf_counter() - t0, 3))
    print(f"q_minhash_lsh: {runs} rows={n}", file=sys.stderr)
    return {"runs": runs, "best": min(runs), "rows": n}


def main():
    what = sys.argv[1] if len(sys.argv) > 1 else "all"
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("measure-r6")
    import json

    out = {}
    if what in ("chunk", "all"):
        out["chunk"] = measure_chunk(spark, sf_dir)
    if what in ("minhash", "all"):
        out["minhash"] = measure_minhash(spark, sf_dir)
    if what == "stages":
        for i in range(3):
            out[f"stages{i}"] = profile_minhash_stages(spark, sf_dir)
    print(json.dumps(out))




def profile_minhash_stages(spark, sf_dir):
    """Time each stage of minhash_lsh_pairs independently."""
    import __spark_entry__ as entry
    from pyspark import StorageLevel
    from pyspark.sql import functions as F
    from deltalake2db_spark.operators import dedup as D

    df = entry._t(spark, sf_dir, "documents")
    t = {}
    t0 = time.perf_counter()
    nparts = df.sparkSession.sparkContext.defaultParallelism * 2
    sh = D.shingle_table(df, "doc_id", "text", 3, partitions=nparts).persist(
        StorageLevel.MEMORY_AND_DISK)
    n_sh = sh.count()
    t["shingle"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    sig = D.minhash_signatures_from_shingles(sh, "doc_id", 32, 42, with_sizes=True
        ).persist(StorageLevel.MEMORY_AND_DISK)
    n_sig = sig.count()
    t["signatures"] = round(time.perf_counter() - t0, 3)
    rows_per_band = 32 // 8
    band_cols = F.array(*[
        F.struct(F.lit(i).alias("band"),
                 F.xxhash64(F.concat_ws(",", *[
                     F.element_at("sig", i * rows_per_band + j + 1).cast("string")
                     for j in range(rows_per_band)])).alias("bh"))
        for i in range(8)])
    banded = sig.select("doc_id", F.explode(band_cols).alias("b")).select(
        "doc_id", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    t0 = time.perf_counter()
    buckets = (banded.groupBy("band", "bh")
               .agg(F.collect_list("doc_id").alias("ids"))
               .filter((F.size("ids") > 1) & (F.size("ids") <= 1000)))
    sorted_ids = F.array_sort("ids")
    pair_structs = F.flatten(F.transform(
        sorted_ids,
        lambda x, i: F.transform(
            F.slice(sorted_ids, i + 2, F.size(sorted_ids)),
            lambda y: F.struct(x.alias("id_a"), y.alias("id_b")))))
    candidates = (buckets.select(F.explode(pair_structs).alias("p"))
                  .select("p.id_a", "p.id_b").distinct()
                  .persist(StorageLevel.MEMORY_AND_DISK))
    n_cand = candidates.count()
    t["banding_candidates"] = round(time.perf_counter() - t0, 3)
    t0 = time.perf_counter()
    res = D.verify_jaccard_pairs_from_shingles(
        sh, candidates, "doc_id", 0.5, sizes=sig.select("doc_id", "n_sh"))
    n_res = res.count()
    t["verify"] = round(time.perf_counter() - t0, 3)
    for x in (sh, sig, candidates):
        x.unpersist()
    t.update({"n_sh": n_sh, "n_sig": n_sig, "n_cand": n_cand, "n_res": n_res})
    return t


if __name__ == "__main__":
    main()
