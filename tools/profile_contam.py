"""Profile q_contamination end-to-end: which part of the 1.2 s gate
costs what (verdict r8 item 1: profile BEFORE optimizing).

Each variant runs in this one JVM, warmed at sf0.001, best-of-3 at
sf0.1.  Sub-plans are forced as standalone jobs so their cost is
attributable; job/stage counts come from the status tracker.
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast

from deltalake2db_spark import get_spark
from deltalake2db_spark.operators.contamination import (
    contamination_check,
    word_ngram_hashes,
)
from deltalake2db_spark.operators.dedup import shingled

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
WARM = "/root/testdata/sf0.001"


def docs(spark, d):
    return spark.read.parquet(os.path.join(d, "documents.parquet"))


def bench_hof(spark, d, distinct=True):
    b = docs(spark, d).filter(F.col("doc_id") % 20 == 0)
    g = b.select(F.explode(word_ngram_hashes(F.col("text"), 8)).alias("__gh"))
    return g.distinct() if distinct else g


def bench_codegen(spark, d, distinct=True):
    b = docs(spark, d).filter(F.col("doc_id") % 20 == 0)
    g = shingled(b, "doc_id", "text", 8, lower=False).select(
        F.col("sh").alias("__gh")
    )
    return g.distinct() if distinct else g


def corpus_grams(spark, d):
    return shingled(docs(spark, d), "doc_id", "text", 8, lower=False
                    ).withColumnRenamed("sh", "__gh")


def full_variant(spark, d, bench_fn, distinct=True):
    doc_grams = corpus_grams(spark, d)
    bg = bench_fn(spark, d, distinct).withColumn("__hit", F.lit(1))
    flagged = doc_grams.join(broadcast(bg), "__gh", "left")
    return (
        flagged.groupBy("doc_id", "__gh")
        .agg(F.max("__hit").alias("__h"))
        .groupBy("doc_id")
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.count("__h").cast("int").alias("n_matched"),
        )
        .withColumn("contaminated", F.col("n_matched") >= F.lit(1))
    )


def measure(spark, name, mk, n=3):
    st = spark.sparkContext.statusTracker()
    mk(WARM).count()  # warm codegen
    best = None
    for _ in range(n):
        spark.catalog.clearCache()
        j0 = st.getJobIdsForGroup(None)
        t0 = time.time()
        mk(SF_DIR).count()
        dt = time.time() - t0
        best = dt if best is None or dt < best else best
    # job/stage count of one run
    spark.sparkContext.setJobGroup("prof", name)
    t0 = time.time()
    mk(SF_DIR).count()
    jids = st.getJobIdsForGroup("prof")
    nstages = sum(
        len(st.getJobInfo(j).stageIds) for j in jids if st.getJobInfo(j)
    )
    spark.sparkContext.setJobGroup(None, None)
    print(f"{name:40s} best={best*1000:7.0f} ms  jobs={len(jids)} stages={nstages}")
    return best


def main():
    spark = get_spark("profile-contam")
    measure(spark, "gate:contamination_check(auto=arrow)",
            lambda d: contamination_check(
                docs(spark, d), docs(spark, d).filter(F.col("doc_id") % 20 == 0), n=8))
    measure(spark, "gate:contamination_check(join)",
            lambda d: contamination_check(
                docs(spark, d), docs(spark, d).filter(F.col("doc_id") % 20 == 0),
                n=8, impl="join"))
    measure(spark, "sub:corpus shingled window fold",
            lambda d: corpus_grams(spark, d))
    measure(spark, "sub:bench HOF fold + distinct",
            lambda d: bench_hof(spark, d, True))
    measure(spark, "sub:bench HOF fold (no distinct)",
            lambda d: bench_hof(spark, d, False))
    measure(spark, "sub:bench codegen shingled + distinct",
            lambda d: bench_codegen(spark, d, True))
    measure(spark, "var:full, HOF bench, no distinct",
            lambda d: full_variant(spark, d, bench_hof, False))
    measure(spark, "var:full, codegen bench, distinct",
            lambda d: full_variant(spark, d, bench_codegen, True))
    measure(spark, "var:full, codegen bench, no distinct",
            lambda d: full_variant(spark, d, bench_codegen, False))
    spark.stop()


if __name__ == "__main__":
    main()
