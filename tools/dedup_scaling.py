"""Corpus-count scaling draws for the DEDUP tier (SCALE.md §7q;
r13 verdict task #6 — the §7n discipline applied to the one tier
whose cost is a shuffle, not a map).

The media/warc curves (§7n) proved the map-side kernels scale
linearly; the dedup operators are different — their cost law is the
size of the fingerprint/shingle EXCHANGE and the bucket-join fan-out,
which is where a quadratic blow-up would hide (an all-pairs design
shows up as 100× pairs per 10× corpus).  This tool sweeps the corpus
1× → 10× through the same operator pipelines the gates certify and
reports, per step: wall-clock, output pair rows, and the actual
shuffle WRITE bytes of the query (from the Spark status store), so
the "shuffle ∝ fingerprints, sub-quadratic growth, bounded buckets"
claim is measured rather than asserted.

Corpus construction: replica r of the documents table carries
doc_id + r·10⁷ and every word prefixed ``r{r}x`` — replicas share NO
shingles/minhash bands with each other, so duplicate DENSITY is
constant as the corpus grows (each replica contains the same
within-replica dup structure as the base).  Pure replication would
instead make every doc an exact dup of its 9 copies and fabricate a
quadratic pair count no real corpus has.

Expected curves per 10× corpus:
* wall-clock: ≤10× once clear of the floor (linear in corpus);
* pair rows: ~10× (linear — dup density constant by construction);
* shuffle bytes: ~10× (the exchange carries (id, fingerprint) /
  shingle-index rows, never the cross product).

Usage::

    python tools/dedup_scaling.py [minhash|jaccard ...]
"""

from __future__ import annotations

import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import functions as F  # noqa: E402


def _docs(spark, sf_dir: str, mult: int):
    base = (
        spark.read.parquet(f"{sf_dir}/documents.parquet")
        .filter(F.col("text").isNotNull())
        .select("doc_id", "text")
    )
    reps = []
    for r in range(mult):
        salted = F.array_join(
            F.transform(
                F.split(F.trim(F.col("text")), r"\s+"),
                lambda w, _r=r: F.concat(F.lit(f"r{_r}x"), w),
            ),
            " ",
        )
        reps.append(
            base.select(
                (F.col("doc_id") + r * 10_000_000).alias("doc_id"),
                salted.alias("text"),
            )
        )
    out = reps[0]
    for rep in reps[1:]:
        out = out.unionByName(rep)
    return out


def _minhash(spark, sf_dir: str, mult: int):
    from deltalake2db_spark.operators import dedup as D

    d = _docs(spark, sf_dir, mult)
    perturbed = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    corpus = d.unionByName(perturbed)
    return D.minhash_lsh_pairs(
        corpus, n=2, num_hashes=64, bands=16, threshold=0.5,
        max_bucket=200,
    )


def _jaccard(spark, sf_dir: str, mult: int):
    from deltalake2db_spark.operators import dedup as D

    return D.ngram_jaccard_pairs(
        _docs(spark, sf_dir, mult), n=2, threshold=0.05
    )


def _jaccard_guarded(spark, sf_dir: str, mult: int):
    # the stop-shingle guard (max_shingle_df) is the operator's scale
    # control: shingles in more than df_max docs leave the index, so
    # the candidate join is bounded by df_max^2 per shingle instead
    # of the corpus's stopword-bigram df^2
    from deltalake2db_spark.operators import dedup as D

    return D.ngram_jaccard_pairs(
        _docs(spark, sf_dir, mult), n=2, threshold=0.05,
        max_shingle_df=64, impl="index",
    )


def _cross(spark, sf_dir: str, mult: int):
    # incremental-ingest shape: NEW = perturbed copies, REF = the
    # scaled corpus; bipartite banding must pay for new-vs-ref band
    # matches only, never intra-ref candidates
    from deltalake2db_spark.operators import dedup as D

    d = _docs(spark, sf_dir, mult)
    new = d.select(
        (F.col("doc_id") + 1_000_000).alias("doc_id"),
        F.expr("substring(text, instr(text, ' ') + 1)").alias("text"),
    )
    return D.minhash_lsh_pairs_cross(
        new, d, n=2, num_hashes=64, bands=16, threshold=0.5,
        max_bucket=200,
    )


BUILDERS = {
    "minhash": _minhash,
    "jaccard": _jaccard,
    "jaccard_guarded": _jaccard_guarded,
    "cross": _cross,
}


def _shuffle_totals(spark) -> tuple[int, int]:
    """(write_bytes, read_bytes) summed over every stage the session
    has completed so far — deltas around a query isolate its cost.
    Reads the driver's AppStatusStore (the same numbers the UI shows;
    the UI itself is disabled in get_spark)."""
    store = spark.sparkContext._jsc.sc().statusStore()
    try:
        # Scala signature with 4 defaulted params (verified on Spark
        # 4.1): pass the compiler-generated defaults explicitly
        # through py4j.  $default$N accessor names are NOT a stable
        # API across Spark minors, hence the guarded fallback below.
        empty = spark.sparkContext._jvm.java.util.ArrayList()
        defaults = [
            getattr(store, f"stageList$default${i}")()
            for i in (2, 3, 4, 5)
        ]
        seq = store.stageList(empty, *defaults)
        w = r = 0
        for i in range(seq.size()):
            st = seq.apply(i)
            w += st.shuffleWriteBytes()
            r += st.shuffleReadBytes()
        return w, r
    except Exception:
        # fallback for a changed Scala signature: the REST status API
        # (stable, versioned) over the driver's own UI port; when the
        # UI is disabled too, return zeros rather than crash a
        # measurement tool
        try:
            import json as _json
            import urllib.request

            base = spark.sparkContext.uiWebUrl
            if not base:
                return 0, 0
            app_id = spark.sparkContext.applicationId
            with urllib.request.urlopen(
                f"{base}/api/v1/applications/{app_id}/stages", timeout=5
            ) as fh:
                stages = _json.load(fh)
            w = sum(s.get("shuffleWriteBytes", 0) for s in stages)
            r = sum(s.get("shuffleReadBytes", 0) for s in stages)
            return w, r
        except Exception:
            return 0, 0


def main() -> None:
    from deltalake2db_spark import get_spark

    import os

    names = sys.argv[1:] or list(BUILDERS)
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    spark = get_spark("dedup_scaling")
    for name in names:
        build = BUILDERS[name]
        build(spark, sf_dir, 1).count()  # settle the 1x shape
        times, bytes_w, rows_out = [], [], []
        for mult in (1, 10):
            best, bw, cnt = None, 0, 0
            for _ in range(2):
                spark.catalog.clearCache()
                spark.sparkContext._jvm.System.gc()
                w0, _ = _shuffle_totals(spark)
                t0 = time.perf_counter()
                cnt = build(spark, sf_dir, mult).count()
                dt = time.perf_counter() - t0
                w1, _ = _shuffle_totals(spark)
                if best is None or dt < best:
                    best, bw = dt, w1 - w0
            times.append(best)
            bytes_w.append(bw)
            rows_out.append(cnt)
            print(
                f"{name} {mult:>2}x: {best:.2f}s, pairs={cnt}, "
                f"shuffle_write={bw / 1e6:.1f} MB",
                flush=True,
            )
        print(
            f"{name} growth per 10x corpus: wall {times[1]/times[0]:.2f}x, "
            f"pairs {rows_out[1]/max(rows_out[0],1):.2f}x, "
            f"shuffle {bytes_w[1]/max(bytes_w[0],1):.2f}x "
            f"(linear=10, quadratic=100)",
            flush=True,
        )


if __name__ == "__main__":
    main()
