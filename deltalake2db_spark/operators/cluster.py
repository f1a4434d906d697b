"""Duplicate-cluster construction: connected components over a pair
list, and cluster-based corpus deduplication.

Near-dup pipelines (MinHash-LSH / SimHash / embedding blocking —
``operators/dedup.py``, ``operators/similarity.py``) emit PAIRS; to
actually deduplicate a corpus the pairs must be closed into clusters
(doc A ~ B, B ~ C => {A, B, C}) and one representative kept per
cluster.  The reference engine has no clustering stage at all — this is
a north-star extension for the training-data use case.

Scale notes: the iterative min-label propagation below shuffles only
(vertex, label) longs per round — never materializing a transitive
closure — and converges in O(cluster diameter) rounds.  Near-dup
clusters are dense (mutual near-copies of one source), so diameter is
tiny in practice; ``max_iter`` bounds adversarial chains.  Every round
persists its frontier and drops the previous one, and lineage is
truncated with ``localCheckpoint`` every few rounds so plan depth stays
bounded regardless of iteration count.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.storagelevel import StorageLevel

__all__ = ["connected_components", "dedup_by_clusters"]

_CHECKPOINT_EVERY = 8


def connected_components(
    pairs: DataFrame,
    id_a: str = "id_a",
    id_b: str = "id_b",
    max_iter: int = 50,
    local_threshold: int = 1_000_000,
) -> DataFrame:
    """Cluster ids for every vertex that appears in ``pairs``.

    Returns (doc_id, cluster_id) where ``cluster_id`` is the MINIMUM
    vertex id of the component — a deterministic labeling, so results
    are oracle-comparable (DuckDB: recursive-CTE reachability + MIN).

    Adaptive strategy, same idea as Spark's broadcast-join threshold:
    a ``limit(local_threshold + 1)`` probe collects the raw pairs in
    one bounded Arrow transfer, and when they all fit, the whole graph
    is a few MB of longs — a driver-side union-find closes it in one
    pass with zero shuffle rounds, where the distributed loop would
    pay O(diameter) scheduled stages to label a toy graph.  Above the
    threshold (the 100 TB case) the probe is discarded and the
    iterative path runs unchanged (its own count sizes the loop).
    Both paths produce the identical min-label output.  Note the
    threshold bounds RAW pair rows on the fast path and symmetrized
    distinct edges on the slow path — both within 2x of each other.

    Distributed algorithm: symmetric min-label propagation.  Each round
    every vertex adopts the smallest label among itself and its
    neighbors; a round that changes nothing (detected by the
    strictly-decreasing label total going flat) ends the loop.  One
    shuffle per round on the (vertex, label) table; the edge table is
    shuffled once into the join layout and reused.
    """
    # AQE re-plans every exchange at stage boundaries; in this loop the
    # per-round shapes are identical and already tiny, and AQE's runtime
    # coalescing breaks the hash-partitioning reuse between rounds (the
    # groupBy(dst) output and the labels table share HashPartitioning
    # on `src`, so rounds avoid one exchange when partitioning is
    # stable).  Measured ~25% faster with AQE off at sf0.1; restored in
    # the finally.
    spark = pairs.sparkSession
    if local_threshold > 0:
        # limit(N+1) probe on the RAW pairs: one bounded Arrow
        # transfer both decides the strategy and supplies the edges —
        # the small-graph path pays no symmetrize/distinct exchange,
        # no persist, and no separate count job (r9: 2 fewer jobs on
        # the dedup gates).  Union-find needs neither direction
        # normalization nor dedup, so raw pairs are fine; at scale the
        # limit pushes into the scan and stops early.
        # CollectLimit escalates from 1 partition (1 -> 4x -> ...): for
        # a probe whose limit usually EXCEEDS the data, that is one
        # wasted job per escalation round (~0.3 s/job of local-mode
        # floor, r9 SCALE.md §7g).  Opening the first bite to the
        # session's parallelism makes the common small-graph case one
        # job; at 100 TB the first bite is still bounded (64 tasks,
        # each stopping at the limit) and escalation proceeds as
        # before.
        ip_before = spark.conf.get(
            "spark.sql.limit.initialNumPartitions", "1"
        )
        spark.conf.set("spark.sql.limit.initialNumPartitions", "64")
        try:
            probe_df = pairs.select(
                F.col(id_a).cast("long").alias("src"),
                F.col(id_b).cast("long").alias("dst"),
            ).limit(local_threshold + 1)
            # toArrow skips the pandas Series build entirely (~3x
            # faster than toPandas on this probe, r10 A/B in SCALE.md)
            if hasattr(probe_df, "toArrow"):
                tbl = probe_df.toArrow()
                n_probe = tbl.num_rows
                edge_iter = zip(
                    tbl.column("src").to_pylist(),
                    tbl.column("dst").to_pylist(),
                )
            else:  # pre-4.0 fallback
                pdf = probe_df.toPandas()
                n_probe = len(pdf)
                edge_iter = zip(pdf["src"].tolist(), pdf["dst"].tolist())
        finally:
            spark.conf.set(
                "spark.sql.limit.initialNumPartitions", ip_before
            )
        if n_probe <= local_threshold:
            return _cc_local(edge_iter, spark)
    aqe_before = spark.conf.get("spark.sql.adaptive.enabled", "true")
    sp_before = spark.conf.get("spark.sql.shuffle.partitions", "200")
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        return _cc_loop(pairs, id_a, id_b, max_iter, int(sp_before))
    finally:
        spark.conf.set("spark.sql.adaptive.enabled", aqe_before)
        spark.conf.set("spark.sql.shuffle.partitions", sp_before)


def _cc_local(edge_rows, spark) -> DataFrame:
    """Driver-side union-find with min-label output — the small-graph
    fast path.  Path-halving find; component label = min vertex id."""
    parent: dict[int, int] = {}

    def find(x: int) -> int:
        r = parent.setdefault(x, x)
        while r != parent[r]:
            parent[r] = parent[parent[r]]
            r = parent[r]
        parent[x] = r
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min keeps every root the component minimum seen
            # so far, so the final pass needs no second min scan
            if ra < rb:
                parent[rb] = ra
            else:
                parent[ra] = rb
    import pandas as pd

    verts = sorted(parent)
    out = pd.DataFrame(
        {"doc_id": verts, "cluster_id": [find(v) for v in verts]},
        dtype="int64",
    )
    return spark.createDataFrame(out)


def _cc_loop(
    pairs: DataFrame,
    id_a: str,
    id_b: str,
    max_iter: int,
    session_partitions: int,
) -> DataFrame:
    e = pairs.select(
        F.col(id_a).cast("long").alias("src"),
        F.col(id_b).cast("long").alias("dst"),
    )
    edges = (
        e.union(e.select(F.col("dst").alias("src"), F.col("src").alias("dst")))
        .distinct()
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    # with AQE off, every round inherits the session's static shuffle
    # width; size it once from the (now cached) edge count — ~2M long
    # pairs per reducer — capped at the session setting so a cluster
    # run on billions of edges keeps its configured parallelism.  With
    # the fleet of tiny per-round stages this is the difference between
    # scheduling 32 empty tasks per stage and scheduling 1-2.
    n_edges = edges.count()
    loop_parts = max(1, min(session_partitions, -(-n_edges // 2_000_000)))
    pairs.sparkSession.conf.set(
        "spark.sql.shuffle.partitions", str(loop_parts)
    )

    labels = (
        edges.select("src")
        .distinct()
        .select("src", F.col("src").alias("label"))
        .persist(StorageLevel.MEMORY_AND_DISK)
    )
    prev_total = None
    for i in range(max_iter):
        prop = (
            edges.join(labels, "src")
            .groupBy(F.col("dst").alias("src"))
            .agg(F.min("label").alias("nl"))
        )
        nxt = labels.join(prop, "src", "left").select(
            "src",
            F.least("label", F.coalesce("nl", F.col("label"))).alias("label"),
        )
        if (i + 1) % _CHECKPOINT_EVERY == 0:
            nxt = nxt.localCheckpoint(eager=False)
        nxt = nxt.persist(StorageLevel.MEMORY_AND_DISK)
        # labels only ever decrease, so the total strictly decreases
        # until the fixpoint; one tiny agg per round is the whole
        # driver-side traffic (decimal: immune to long overflow at any
        # vertex-id scale)
        total = nxt.agg(
            F.sum(F.col("label").cast("decimal(38,0)")).alias("t")
        ).collect()[0]["t"]
        labels.unpersist()
        labels = nxt
        if total == prev_total:
            break
        prev_total = total
    edges.unpersist()
    return labels.select(
        F.col("src").alias("doc_id"), F.col("label").alias("cluster_id")
    )


def dedup_by_clusters(
    df: DataFrame,
    pairs: DataFrame,
    id_col: str = "doc_id",
    id_a: str = "id_a",
    id_b: str = "id_b",
) -> DataFrame:
    """Keep one representative per duplicate cluster (the minimum id)
    plus every unpaired document — the standard "drop near-dups" step.

    Anti-join of ``df`` against the non-representative cluster members;
    documents never named in ``pairs`` survive untouched.  The losers
    table is ~(cluster members - clusters) rows — tiny next to the
    corpus — so Catalyst broadcast-joins it at any corpus scale where
    the duplicate fraction is sane.
    """
    cc = connected_components(pairs, id_a=id_a, id_b=id_b)
    losers = cc.filter(F.col("doc_id") != F.col("cluster_id")).select(
        F.col("doc_id").alias(id_col)
    )
    return df.join(losers, on=id_col, how="left_anti")
