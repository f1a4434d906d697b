"""Round-15 A/B micro-measurements (warm session, bench-identical conf).

Each experiment builds two (or more) DataFrame variants of the same
computation and times .count() with clearCache + driver GC between
samples, min-of-N — the bench's steady-state discipline without the
fresh-JVM cost, good for RELATIVE comparisons on one host mode.

Usage: python tools/ab_r15.py <experiment> [sf_dir]
  experiments: chunks | fixwidth | dsir | unimax | bloom
"""
from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

N_SAMPLES = 5


def bench_df(spark, label, build, n=N_SAMPLES):
    import gc

    times = []
    rows = None
    for _ in range(n):
        spark.catalog.clearCache()
        gc.collect()
        spark.sparkContext._jvm.System.gc()
        t0 = time.perf_counter()
        df = build()
        rows = df.count()
        times.append(time.perf_counter() - t0)
    times.sort()
    print(
        f"  {label}: min {times[0]:.3f}s med {times[len(times)//2]:.3f}s "
        f"({rows} rows) {['%.2f' % t for t in times]}"
    )
    return times[0]


def exp_chunks(spark, sf_dir):
    """sliding_chunks: struct-HOF (current) vs string-HOF + post-explode
    start_word arithmetic vs explode-then-slice."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry

    docs = entry._t(spark, sf_dir, "documents")
    w, s = F.lit(24), F.lit(16)

    def current():
        from deltalake2db_spark.operators.text import sliding_chunks

        return sliding_chunks(docs, chunk_words=24, stride_words=16)

    def string_hof():
        words = F.split(F.trim(F.col("text")), r"\s+")
        n = F.size(words)
        n_starts = F.lit(1) + F.ceil(
            F.greatest(n - w, F.lit(0)) / s
        ).cast("int")
        chunks = F.transform(
            F.sequence(F.lit(0), n_starts - F.lit(1)),
            lambda i: F.array_join(F.slice(words, i * s + F.lit(1), w), " "),
        )
        out = docs.filter(
            F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        ).select("doc_id", F.posexplode(chunks).alias("chunk_idx", "chunk"))
        return out.select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * s).alias("start_word"),
            F.size(F.split(F.col("chunk"), " ", -1)).alias("n_words"),
            "chunk",
        )

    def explode_slice():
        words = F.split(F.trim(F.col("text")), r"\s+")
        n = F.size(words)
        n_starts = F.lit(1) + F.ceil(
            F.greatest(n - w, F.lit(0)) / s
        ).cast("int")
        out = docs.filter(
            F.col("text").isNotNull() & (F.trim(F.col("text")) != "")
        ).select(
            "doc_id",
            words.alias("__ws"),
            F.posexplode(F.sequence(F.lit(0), n_starts - F.lit(1))).alias(
                "chunk_idx", "__i"
            ),
        )
        chunk = F.array_join(
            F.slice(F.col("__ws"), F.col("__i") * s + F.lit(1), w), " "
        )
        return out.select(
            "doc_id",
            "chunk_idx",
            (F.col("chunk_idx") * s).alias("start_word"),
            F.size(F.split(chunk, " ", -1)).alias("n_words"),
            chunk.alias("chunk"),
        )

    bench_df(spark, "struct-HOF (current)", current)
    bench_df(spark, "string-HOF", string_hof)
    bench_df(spark, "explode-then-slice", explode_slice)


def exp_fixwidth(spark, sf_dir):
    """Media fixture synthesis width: range(n) at default 32 slices vs
    row-count-derived slices, on two representative gates' shapes."""
    from pyspark.sql import functions as F  # noqa: F401

    from deltalake2db_spark.operators import multimodal as M

    for n_parts in (None, 16, 13, 8, 4):
        label = f"webp_lossy numPartitions={n_parts or 'default(32)'}"

        def build(n_parts=n_parts):
            media = M.make_real_media(
                spark, 100, width=32, height=32, fmt="vp8"
            )
            if n_parts is not None:
                # simulate by repartitioning the range BEFORE the map —
                # make_real_media builds internally, so rebuild inline
                import pandas as _pd  # noqa: F401

                media = None
                rng = spark.range(100, numPartitions=n_parts)
                # reuse the operator's gen via a tiny shim: call the
                # public builder on a pre-made range is not exposed, so
                # approximate with the decode stage only below.
                media = M.make_real_media(
                    spark, 100, width=32, height=32, fmt="vp8"
                )
            feats = M.extract_image_features(media)
            return feats.select("media_id", "n_px")

        if n_parts is None:
            bench_df(spark, label, build)
    print("  (fixwidth A/B needs the operator patch - run after editing)")


def exp_dsir(spark, sf_dir):
    """dsir_logweights: lazy twin-branch (current) vs per_bucket persist."""
    from pyspark.sql import functions as F
    from pyspark.sql.functions import broadcast

    import __spark_entry__ as entry
    from deltalake2db_spark.operators.dsir import (
        dsir_logweights,
        feature_buckets,
    )

    d = entry._t(spark, sf_dir, "documents")

    def current():
        return dsir_logweights(d, F.col("lang") == "en")

    def persisted():
        n_buckets = 1024
        feats = feature_buckets(
            d.withColumn("__tgt", F.col("lang") == "en"),
            "text", "doc_id", n_buckets, carry_cols=("__tgt",),
        )
        per_bucket = feats.groupBy("doc_id", "b").agg(
            F.count(F.lit(1)).alias("c"),
            F.sum(
                F.when(F.col("__tgt"), F.lit(1)).otherwise(F.lit(0))
            ).alias("tc_part"),
        ).persist()
        hist = per_bucket.groupBy("b").agg(
            F.sum("c").alias("rc"), F.sum("tc_part").alias("tc")
        )
        tots = hist.agg(F.sum("rc").alias("R"), F.sum("tc").alias("T"))
        lam = hist.crossJoin(broadcast(tots)).select(
            "b",
            (
                F.log((F.col("tc") + F.lit(1.0)) / (F.col("T") + F.lit(1024.0)))
                - F.log((F.col("rc") + F.lit(1.0)) / (F.col("R") + F.lit(1024.0)))
            ).alias("l"),
        )
        return (
            per_bucket.join(broadcast(lam), "b")
            .groupBy("doc_id")
            .agg(
                F.sum("c").cast("long").alias("n_feats"),
                F.sum("tc_part").cast("long").alias("n_target_feats"),
                F.round(F.sum(F.col("c") * F.col("l")), 6).alias("log_weight"),
            )
        )

    bench_df(spark, "lazy twin-branch (current)", current)
    bench_df(spark, "per_bucket persist", persisted)


def exp_unimax(spark, sf_dir):
    """q_unimax: lazy counts (current, multi-derived) vs counts persist."""
    from pyspark.sql import functions as F

    import __spark_entry__ as entry
    from deltalake2db_spark.operators.sampling import unimax_allocation

    d = entry._t(spark, sf_dir, "documents")

    def current():
        counts = d.groupBy("lang").agg(F.sum("n_chars").alias("n_tokens"))
        return unimax_allocation(counts, budget_frac=0.6, max_epochs=1.2)

    def persisted():
        counts = d.groupBy("lang").agg(
            F.sum("n_chars").alias("n_tokens")
        ).persist()
        return unimax_allocation(counts, budget_frac=0.6, max_epochs=1.2)

    bench_df(spark, "lazy counts (current)", current)
    bench_df(spark, "persisted counts", persisted)


def exp_bloom(spark, sf_dir):
    """q_bloom_decontam: confirm stage at corpus width (current) vs
    AQE-coalesced repartition of the suspect sliver."""
    import __spark_entry__ as entry

    def current():
        return entry.q_bloom_decontam(spark, sf_dir)

    bench_df(spark, "current", current)
    print("  (repartition variant needs the operator patch)")


def main():
    exp = sys.argv[1] if len(sys.argv) > 1 else "chunks"
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1"
    )
    from deltalake2db_spark import get_spark

    spark = get_spark("ab-r15")
    spark.sparkContext.setJobDescription(f"ab_r15:{exp}")
    fn = globals()[f"exp_{exp}"]
    print(f"== {exp} @ {sf_dir} ==")
    fn(spark, sf_dir)


if __name__ == "__main__":
    main()
