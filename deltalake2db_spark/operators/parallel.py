"""Scan-parallelism guard for CPU-heavy map stages.

A parquet ROW GROUP is the unit of scan splitting: a corpus that
arrives as one file with one row group scans as ONE task no matter how
many cores the session has (``spark.sql.files.minPartitionNum`` splits
byte ranges, but every range except the row group's maps to zero
rows).  Any operator whose map side is expensive — tokenize + explode
+ partial aggregation, per-word hashing — then runs single-threaded
before its first exchange.  Measured at sf0.1 (single-row-group
documents.parquet, 32-core local): the BM25 tf stage took 3.05 s on
one task; a round-robin repartition ahead of it cut the full gate
4.92 → 2.00 s.

``spread_scan`` repartitions ONLY when the source is
parallelism-deficient, so at the 100 TB design point (thousands of
input files, wide scans) it is a no-op and never inserts a
corpus-sized shuffle; in the deficient case the shuffle it adds moves
raw rows once — strictly cheaper than leaving every token of the
corpus on one core.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def _session_cores(spark) -> int:
    """Physical task slots of the session (local[N] threads, or the
    cluster's defaultParallelism = total executor cores)."""
    sc = spark.sparkContext
    master = sc.master or ""
    if master.startswith("local["):
        inner = master[len("local["):-1].split(",")[0]
        if inner != "*":
            try:
                return max(int(inner), sc.defaultParallelism)
            except ValueError:
                pass
    return sc.defaultParallelism


def spread_scan(
    df: DataFrame, min_ratio: int = 4, chain_depth: int = 1
) -> DataFrame:
    """Round-robin repartition ``df`` to the session's scan width when
    its current parallelism is more than ``min_ratio``× below it;
    otherwise return ``df`` unchanged.

    Call this ahead of a CPU-heavy map stage (tokenize/explode/hash)
    whose input may be a small number of row groups.  Values are
    partition-independent downstream (aggregates, windows keyed by
    row-local ids), so the round-robin placement never changes
    results.

    ``chain_depth`` is the number of CHAINED Python kernels
    (mapInPandas / pandas-UDF stages with no exchange or
    materialization between them) each task of the downstream stage
    pipelines.  Each chained kernel runs in its own Python worker
    process, so a stage of width W with depth D runs ~W×D workers at
    once; at full-cores width that oversubscribes the host D× and
    thrashes.  Measured at local[32] on the crawl-pipeline gate
    (synthesize → WARC parse → robots eval → HTML extract, depth 4):
    width 32 → 8-22 s erratic, some JVMs never settling; width 8-16 →
    stable 3.1-3.5 s.  The law: ``width = cores ÷ chain_depth``.  On
    a cluster the same rule applies per-executor
    (``spark.executor.cores ÷ chain_depth``); alternatively
    materialize between Python tiers so each stage's depth is 1.
    """
    cores = _session_cores(df.sparkSession)
    target = max(2, cores // max(chain_depth, 1))
    if df.rdd.getNumPartitions() * min_ratio <= target:
        return df.repartition(target)
    return df


def fusable_map(df: DataFrame, fn, schema) -> DataFrame:
    """``df.mapInPandas(fn, schema)`` that additionally records the
    ``(child, fn)`` pair on the result, so a DIRECTLY-downstream
    Python kernel built through ``kernel_map`` can FUSE with it into
    one ``mapInPandas`` stage.

    Why fuse (guide §4.1/§4.2): every Python kernel pays a full
    JVM -> Arrow -> worker -> Arrow -> JVM round trip of ALL the bytes
    it emits, plus a per-kernel worker/serializer setup — for a
    synthesize -> parse pair the entire intermediate payload column
    crosses the boundary twice for no reason.  Composing the two
    functions inside ONE ``mapInPandas`` hands the producer's pandas
    batches straight to the consumer in the same worker process: the
    intermediate never leaves Python.  Semantics are identical
    (``mapInPandas`` is per-partition; chaining two per-partition
    iterator transforms equals applying them in sequence), and any
    transformation BETWEEN the kernels returns a fresh DataFrame
    without the recorded handle, so fusion silently degrades to the
    conventional two-stage plan whenever the frames are not directly
    adjacent.  ``SPARK_GRAFT_NO_FUSE=1`` disables fusion globally.
    """
    out = df.mapInPandas(fn, schema=schema)
    out._dl2db_kernel = (df, fn)
    return out


def kernel_map(df: DataFrame, fn, schema, cols=None) -> DataFrame:
    """Apply a per-partition pandas kernel to ``df`` —
    ``df.select(*cols).mapInPandas(fn, schema)`` — fusing with an
    immediately-upstream ``fusable_map`` kernel when one is recorded
    (see ``fusable_map``).  ``cols`` prunes the JVM->Python transfer
    on the UNFUSED path (guide §4.1: pass only the columns the
    function needs); on the fused path the producer's batches are
    already in-process, so pruning is moot and ``fn`` simply reads
    the columns it wants."""
    import os

    k = getattr(df, "_dl2db_kernel", None)
    if k is not None and os.environ.get("SPARK_GRAFT_NO_FUSE") != "1":
        child, prev = k

        def fused(it, _prev=prev, _fn=fn):
            return _fn(_prev(it))

        return fusable_map(child, fused, schema)
    if cols is not None:
        df = df.select(*cols)
    return fusable_map(df, fn, schema)


def cached_leaf(df: DataFrame) -> DataFrame:
    """Return a DataFrame whose LOGICAL plan is the persisted cache
    entry of ``df`` itself (the ``InMemoryRelation`` leaf), with the
    lineage below the cache point truncated.  ``df`` must already be
    ``.persist()``-ed; execution is unchanged — the same cache is
    built lazily on first use and every consumer reads it — but plans
    built ON TOP of the returned frame no longer embed the full
    upstream subtree, so the driver stops re-analyzing/canonicalizing
    that subtree once per downstream reference.

    Why it matters: a query that fans out N ways above a persisted
    frame (dedup winners semi-join + inverted index + anti-join, as in
    the crawl pipeline) embeds the ingest lineage N times in its
    analyzed plan; Catalyst analysis, optimization, and the cache
    lookup's canonicalization are all O(plan size) PER REFERENCE.
    With a deep Python ingest chain below the cut this is a fixed
    driver-side cost per action — paid at any scale factor, and the
    dominant term at the local-mode floor.  Unlike
    ``localCheckpoint()`` (measured slower: it materializes an RDD
    copy and drops the columnar cache), this keeps the exact persist
    semantics and storage.

    Falls back to returning ``df`` unchanged when the cache entry is
    not found or the cached plan advertises an output ordering — a
    re-instanced InMemoryRelation leaf (self-join deduplication) does
    not remap a stale ordering (verified on Spark 4.1), so ordered
    cache plans keep the conventional path.  Uses the session's JVM
    CacheManager via py4j; any internals mismatch degrades to the
    plain frame, never to an error.
    """
    try:
        spark = df.sparkSession
        jspark = spark._jsparkSession
        opt = jspark.sharedState().cacheManager().lookupCachedData(df._jdf)
        if not opt.isDefined():
            return df
        imr = opt.get().cachedRepresentation()
        if not imr.cachedPlan().outputOrdering().isEmpty():
            return df
        jdf = spark._jvm.org.apache.spark.sql.classic.Dataset.ofRows(
            jspark, imr
        )
        return DataFrame(jdf, spark)
    except Exception:
        return df
