"""Plan-quality audit: asserts the physical plans have the properties a
100-TB deployment needs, and dumps `explain("formatted")` output for
review.

Checks:
 1. scan_delta row-filter conditions appear as PushedFilters on the
    parquet scan (predicate pushdown through the column-mapping rewrite);
 2. select= prunes the parquet ReadSchema (column pruning);
 3. q5's dimension joins are broadcast (no shuffle of the fact table for
    dim joins);
 4. the delta scan contains no shuffle (Exchange) before the user's
    first wide transform;
 5. brute-force top-k plan contains no Exchange before the final window
    (corpus never shuffles).

Usage: python tools/explain_audit.py [--dump]  (dump writes PLANS.md)
"""

from __future__ import annotations

import re
import sys

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/tests")


def plan_of(df) -> str:
    return df._jdf.queryExecution().executedPlan().toString()


def formatted(df) -> str:
    return df._sc._jvm.PythonSQLUtils.explainString(
        df._jdf.queryExecution(), "formatted"
    )


def main() -> int:
    from fixture_tables import build_faker2, build_user

    import __spark_entry__ as entry
    from deltalake2db_spark import get_spark, scan_delta

    spark = get_spark("explain_audit", cpus=8)
    sf = "/root/testdata/sf0.001"
    failures: list[str] = []
    sections: list[tuple[str, str]] = []

    import tempfile, os

    tmp = tempfile.mkdtemp(prefix="audit_")
    user = build_user(os.path.join(tmp, "user"))
    faker2 = build_faker2(os.path.join(tmp, "faker2"))

    # 1. predicate pushdown through scan_delta
    df = scan_delta(spark, user, conditions=[("FirstName", "=", "Peter")])
    p = plan_of(df)
    if "PushedFilters: [IsNotNull(FirstName), EqualTo(FirstName,Peter)]" not in p:
        failures.append("scan_delta filter NOT pushed to parquet scan")
    sections.append(("scan_delta predicate pushdown", formatted(df)))

    # 2. column pruning via select=
    df = scan_delta(spark, user, select=["FirstName", "Age"])
    p = plan_of(df)
    m = re.search(r"ReadSchema: struct<([^>]*)>", p)
    read_cols = m.group(1) if m else "?"
    if "LastName" in read_cols or "companyid" in read_cols:
        failures.append(f"select= did not prune parquet ReadSchema: {read_cols}")
    sections.append(("scan_delta column pruning", formatted(df)))

    # 3. column-mapped partitioned scan has no Exchange (pure scan+union)
    df = scan_delta(spark, faker2)
    p = plan_of(df)
    if "Exchange" in p:
        failures.append("column-mapped scan introduces a shuffle")
    sections.append(("column-mapped scan (no shuffle)", formatted(df)))

    # 4. q5 joins the small dims via broadcast
    df = entry.q5_nation_revenue(spark, sf)
    p = plan_of(df)
    if p.count("BroadcastHashJoin") < 3:
        failures.append("q5 dimension joins are not broadcast")
    sections.append(("q5 broadcast dimension joins", formatted(df)))

    # 5. arrow top-k: corpus side has no Exchange before mapInPandas
    emb = spark.read.parquet(f"{sf}/embeddings.parquet")
    from deltalake2db_spark.operators.similarity import brute_force_topk
    from pyspark.sql import functions as F

    df = brute_force_topk(emb, emb.filter(F.col("vec_id") < 3), k=3)
    p = plan_of(df)
    # plan prints top-down: everything AFTER the MapInPandas line is the
    # corpus scan subtree, which must be shuffle-free
    scan_to_map = p.split("MapInPandas")[-1]
    sections.append(("brute-force top-k (corpus unshuffled)", formatted(df)))
    if "Exchange" in scan_to_map:
        failures.append("top-k shuffles the corpus before scoring")

    # 6. change-feed cdc read groups files: one parquet scan per
    # partition group, not one per cdc file
    from deltalake2db_spark.sources.changes import table_changes
    from deltalake2db_spark.sources.delta_sink import write_delta
    from deltalake2db_spark.sources.maintenance import update_where

    cdf = os.path.join(tmp, "cdf")
    write_delta(
        spark.range(0, 200).selectExpr("id", "cast(id as double) as v")
        .repartition(6),
        cdf, configuration={"delta.enableChangeDataFeed": "true"},
    )
    update_where(spark, cdf, "id % 2 = 0", {"v": "v + 1"})  # 6 files hit
    df = table_changes(spark, cdf, 0, 1)
    p = plan_of(df)
    n_scans = p.count("Scan parquet")
    if n_scans > 2:  # unpartitioned table: at most one scan per cdc group
        failures.append(
            f"cdc feed read plans {n_scans} parquet scans for one "
            "partition group (per-file blowup)"
        )
    sections.append(("change-feed cdc grouped read", formatted(df)))

    # 7. chunk dedup (join strategy): the winner min(struct) aggregate
    # must run partial BEFORE the exchange — map-side combine is what
    # keeps a pathologically common chunk from piling one reducer
    from deltalake2db_spark.operators.dedup import dedup_chunks

    docs = spark.read.parquet(f"{sf}/documents.parquet").select(
        "doc_id", "text"
    )
    df = dedup_chunks(docs, winner="join")
    p = plan_of(df)
    first_exchange = p.find("Exchange hashpartitioning(chunk")
    pre = p[first_exchange:] if first_exchange >= 0 else p
    # plan prints top-down: the subtree after the chunk exchange must
    # contain the partial HashAggregate feeding it
    if "partial_min" not in pre:
        failures.append(
            "chunk-dedup winner aggregate is not map-side partial"
        )
    sections.append(("chunk dedup map-side winner aggregate", formatted(df)))

    # 8. fused IVF-PQ search: the raw corpus flows straight into ONE
    # MapInArrow (assign+encode+ADC fused) with no Exchange below it —
    # the only shuffle allowed is the final k-row window merge above
    from deltalake2db_spark.operators.pq import ivf_pq_topk, pq_train

    cents = [
        r["embedding"]
        for r in emb.orderBy("vec_id").limit(4).collect()
    ]
    cb = pq_train(emb.orderBy("vec_id"), m=8, ksub=8, iters=2)
    df = ivf_pq_topk(emb, emb.filter(F.col("vec_id") < 3), cents, cb, k=3)
    p = plan_of(df)
    below_map = p.split("MapInArrow")[-1]
    if "Exchange" in below_map:
        failures.append("ivf_pq_topk shuffles the corpus before the fused scan")
    if p.count("MapInArrow") != 1:
        failures.append(
            f"ivf_pq_topk plans {p.count('MapInArrow')} python stages; "
            "assign+encode+ADC must be ONE fused pass"
        )
    sections.append(("fused IVF-PQ single-pass scan", formatted(df)))

    # 9. DSIR: histogram and scoring branches must SHARE the corpus
    # exchange (ReuseExchange) — one FileScan total.  Catalyst pruning
    # the target flag out of one branch silently re-scans+re-shuffles
    # the corpus (the r9 regression n_target_feats exists to prevent).
    from deltalake2db_spark.operators.dsir import dsir_logweights

    docs = spark.read.parquet(f"{sf}/documents.parquet")
    df = dsir_logweights(docs, F.col("lang") == "en")
    p = plan_of(df)
    if p.count("Scan parquet") != 1:
        failures.append(
            f"dsir_logweights scans the corpus {p.count('Scan parquet')}x; "
            "the lambda branch must reuse the window exchange"
        )
    if "ReusedExchange" not in p:
        failures.append("dsir_logweights lambda branch does not ReuseExchange")
    sections.append(("DSIR shared corpus exchange", formatted(df)))

    # 10. BM25: ONE corpus tokenize pass — N/avgdl stats ride the same
    # scan via the first-token rows and consume the tf exchange through
    # ReuseExchange (r11; the two-pass formulation paid a second full
    # read of the text column), and every join is broadcast (query
    # side is model-sized).
    from deltalake2db_spark.operators.bm25 import bm25_topk

    qdf = spark.createDataFrame(
        [(1, "the quick brown"), (2, "lazy dog")],
        "query_id long, text string",
    )
    df = bm25_topk(docs, qdf, k=3)
    p = plan_of(df)
    if p.count("Scan parquet") != 1:
        failures.append(
            f"bm25_topk scans the corpus {p.count('Scan parquet')}x "
            "(the tokenize pass is the only sanctioned scan)"
        )
    if "ReusedExchange" not in p:
        failures.append("bm25_topk stats branch does not ReuseExchange")
    if "SortMergeJoin" in p:
        failures.append("bm25_topk shuffles a join that must broadcast")
    sections.append(("BM25 one-pass corpus, broadcast joins", formatted(df)))

    # 11. persisted IVF-PQ index search: the pruned delta scan of the
    # codes flows into ONE MapInArrow (ADC) with no Exchange below it,
    # and the scan reads only the PROBED cells' files (log-level
    # partition pruning — the file list in the plan location shrinks)
    from deltalake2db_spark.operators.pq import (
        build_ivf_pq_index,
        ivf_pq_index_topk,
    )

    idx_path = os.path.join(tmp, "ivfpq_idx")
    build_ivf_pq_index(emb, cents, cb, idx_path)
    df = ivf_pq_index_topk(
        spark, idx_path, emb.filter(F.col("vec_id") < 3), cb, cents,
        k=3, nprobe=2,
    )
    p = plan_of(df)
    below_map = p.split("MapInArrow")[-1]
    if "Exchange" in below_map:
        failures.append("ivf_pq_index_topk shuffles the coded corpus")
    if p.count("MapInArrow") != 1:
        failures.append("ivf_pq_index_topk must be ONE ADC pass")
    # file-level pruning itself is proven by
    # tests/test_pq.py::test_ivf_pq_index_prunes_unprobed_cells
    # (corrupting an unprobed cell's parquet leaves results unchanged)
    sections.append(("IVF-PQ index pruned search", formatted(df)))

    # 12. TPC-H q4 (r12): the correlated EXISTS must compile to a
    # LEFT SEMI join (one pass over lineitem), never a per-row
    # subquery or a cartesian product
    df = entry.q4_order_priority(spark, sf)
    p = plan_of(df)
    if "LeftSemi" not in p:
        failures.append("q4 EXISTS did not compile to a LEFT SEMI join")
    if "CartesianProduct" in p:
        failures.append("q4 planned a cartesian product")
    sections.append(("TPC-H q4 EXISTS as LEFT SEMI", formatted(df)))

    # 13. TPC-H q8 (r12): all six dimension joins broadcast; at most
    # the lineitem-orders join is allowed to shuffle
    df = entry.q8_market_share(spark, sf)
    p = plan_of(df)
    if p.count("BroadcastHashJoin") < 6:
        failures.append(
            f"q8 has {p.count('BroadcastHashJoin')} broadcast joins; "
            "all six dimensions must broadcast"
        )
    if p.count("SortMergeJoin") > 1:
        failures.append("q8 shuffles more than the one fact-fact join")
    sections.append(("TPC-H q8 broadcast dimension star", formatted(df)))

    # 14. TPC-H q17 (r12): the per-part average comes back as a
    # broadcast aggregate — no Window re-sort of the fact rows
    df = entry.q17_small_quantity(spark, sf)
    p = plan_of(df)
    if "Window" in p:
        failures.append(
            "q17 uses a window over the fact table; the per-part avg "
            "must be an aggregate broadcast back"
        )
    if "BroadcastHashJoin" not in p:
        failures.append("q17 avg-quantity join is not broadcast")
    sections.append(("TPC-H q17 avg broadcast-back", formatted(df)))

    # 15. pipeline e2e (r13): the composed crawl->training-text chain
    # must stay map-side through ingest (no cartesian, no collect),
    # persist the post-extraction checkpoint exactly once (InMemory
    # scan present), and shuffle only pair/fingerprint-level rows —
    # every Exchange keys on ids/shingles/fingerprints, never raw text
    # round-robin (the one RoundRobin is the spread_scan of the source
    # docs ahead of the Python ingest kernels)
    df = entry.q_pipeline_e2e(spark, sf)
    p = plan_of(df)
    if "CartesianProduct" in p or "BroadcastNestedLoopJoin" in p:
        failures.append("pipeline_e2e plans a nested-loop/cartesian join")
    if "InMemoryTableScan" not in p:
        failures.append(
            "pipeline_e2e lost its persist checkpoint between the "
            "ingest and dedup tiers"
        )
    # the cached ingest subtree prints once per consuming branch, so
    # count DISTINCT exchange plan ids, not textual occurrences
    rr = len(set(re.findall(
        r"RoundRobinPartitioning\(\d+\), [A-Z_]+, \[plan_id=(\d+)\]", p
    )))
    if rr > 2:
        failures.append(
            f"pipeline_e2e has {rr} distinct round-robin exchanges; "
            "only the source spread_scan is allowed"
        )
    sections.append(("pipeline e2e shape", formatted(df)))

    if "--dump" in sys.argv:
        with open("/root/repo/PLANS.md", "w") as fh:
            fh.write("# Physical plan audit (generated by tools/explain_audit.py)\n")
            for title, text in sections:
                fh.write(f"\n## {title}\n\n```\n{text}\n```\n")
        print("wrote PLANS.md")

    if failures:
        print("AUDIT FAIL:")
        for f in failures:
            print(" -", f)
        return 1
    print(f"AUDIT PASS: {len(sections)} plan properties verified")
    return 0


if __name__ == "__main__":
    sys.exit(main())
