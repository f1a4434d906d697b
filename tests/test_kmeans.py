"""Tests for k-means clustering + SemDeDup semantic dedup."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from conftest import SF_DIR

from deltalake2db_spark.operators.kmeans import (
    kmeans_assign,
    kmeans_fit,
    semantic_dedup,
)


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(os.path.join(SF_DIR, "embeddings.parquet"))


def _centroids(emb, k=4):
    rows = emb.orderBy("vec_id").limit(k).collect()
    return [list(map(float, r["embedding"])) for r in rows]


def test_assign_arrow_matches_column(emb):
    cents = _centroids(emb)
    a = {r["vec_id"]: r["cell"]
         for r in kmeans_assign(emb, cents, impl="arrow").collect()}
    c = {r["vec_id"]: r["cell"]
         for r in kmeans_assign(emb, cents, impl="column").collect()}
    assert a == c
    assert set(a.values()) <= set(range(4))


def test_assign_seed_vectors_map_to_own_cell(emb):
    # a centroid IS vector i, so vector i's distance to cell i is 0
    cents = _centroids(emb)
    got = {r["vec_id"]: r["cell"]
           for r in kmeans_assign(emb, cents, impl="column").collect()}
    for i in range(4):
        assert got[i] == i


def test_kmeans_fit_deterministic_and_improves(spark, emb):
    import numpy as np

    c1 = kmeans_fit(emb, k=4, iters=3)
    c2 = kmeans_fit(emb, k=4, iters=3)
    assert c1 == c2  # deterministic end-to-end

    def sse(cents):
        assigned = kmeans_assign(emb, cents, impl="arrow")
        rows = assigned.select("embedding", "cell").collect()
        return sum(
            float(np.sum((np.asarray(r["embedding"], dtype=float)
                          - np.asarray(cents[r["cell"]])) ** 2))
            for r in rows
        )

    assert sse(c1) <= sse(_centroids(emb)) + 1e-9  # no worse than init


def test_semantic_dedup_keeps_min_id_representative(emb):
    from deltalake2db_spark.operators.similarity import neardup_pairs_blocked

    cents = _centroids(emb)
    survivors = semantic_dedup(
        emb, centroids=cents, threshold=0.25,
        assign_impl="column", pairs_impl="arrow",
    )
    ids = {r["vec_id"] for r in survivors.select("vec_id").collect()}
    assigned = kmeans_assign(emb, cents, impl="column")
    pairs = neardup_pairs_blocked(
        assigned, threshold=0.25, block_col="cell", impl="arrow"
    ).collect()
    losers = {r["id_b"] for r in pairs}
    all_ids = {r["vec_id"] for r in emb.select("vec_id").collect()}
    assert ids == all_ids - losers
    # every dropped vector has a surviving (or transitively dropped)
    # lower-id partner; min id of the corpus always survives
    assert min(all_ids) in ids


import pytest


@pytest.mark.parametrize(
    "variant",
    [
        # (kwargs, exercised path)
        {},  # default: _decontam_broadcast_ref fused mapInPandas
        {"broadcast_ref_max": 0},  # blocked bipartite GEMM kernel
        {"pairs_impl": "column"},  # parity-encoded Catalyst replay
    ],
    ids=["broadcast", "bipartite", "column"],
)
def test_semantic_dedup_against_bipartite(spark, variant):
    """Cross-corpus SemDeDup: a new vector near-identical to a REF
    vector drops; an intra-NEW duplicate pair does not disqualify
    either copy; overlapping ids are safe on every path (the column
    variant exercises the parity encoding specifically).  All three
    physical paths must produce the identical survivor set."""
    from deltalake2db_spark.operators.kmeans import semantic_dedup_against

    ref = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    dup = [0.0, 0.0, 1.0, 0.0]
    new = spark.createDataFrame(
        [
            (1, [0.99, 0.05, 0.0, 0.0]),  # ~ref#1 -> dropped (id collides)
            (2, dup),                      # intra-new dup with #3
            (3, dup),                      # both survive (no ref match)
        ],
        ["vec_id", "embedding"],
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]
    out = semantic_dedup_against(
        new, ref, centroids=cents, threshold=0.9, **variant
    )
    assert {r["vec_id"] for r in out.collect()} == {2, 3}


def test_semantic_dedup_against_byte_bound(spark):
    """A ref side whose rows x dim x 8 exceeds broadcast_ref_max_bytes
    must take the blocked path (row bound alone was the r8 hazard) —
    and still produce the right survivors."""
    from deltalake2db_spark.operators.kmeans import semantic_dedup_against

    ref = spark.createDataFrame(
        [(1, [1.0, 0.0, 0.0, 0.0]), (2, [0.0, 1.0, 0.0, 0.0])],
        ["vec_id", "embedding"],
    )
    new = spark.createDataFrame(
        [(7, [0.99, 0.05, 0.0, 0.0]), (8, [0.0, 0.0, 1.0, 0.0])],
        ["vec_id", "embedding"],
    )
    cents = [[1.0, 0.0, 0.0, 0.0], [0.0, 1.0, 0.0, 0.0],
             [0.0, 0.0, 1.0, 0.0]]
    # 2 rows x 4 dim x 8 B = 64 B > 32 B cap -> blocked path
    out = semantic_dedup_against(
        new, ref, centroids=cents, threshold=0.9,
        broadcast_ref_max_bytes=32,
    )
    assert {r["vec_id"] for r in out.collect()} == {8}
    # assign_impl='column' (bit-reproducible oracle path) must not be
    # silently replaced by the fused kernel's arrow argmin
    out2 = semantic_dedup_against(
        new, ref, centroids=cents, threshold=0.9, assign_impl="column"
    )
    assert {r["vec_id"] for r in out2.collect()} == {8}


# ------------------------------------------------------- prototype pruning

def _proto_fixture(spark):
    import random

    rng = random.Random(11)
    rows = []
    for i in range(60):
        base = [2.0, 0.0] if i % 2 == 0 else [0.0, 2.0]
        rows.append(
            (i, [base[0] + rng.uniform(-1, 1), base[1] + rng.uniform(-1, 1)])
        )
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def test_prototype_prune_counts_and_hardness(spark):
    from deltalake2db_spark.operators.kmeans import (
        kmeans_assign,
        prototype_prune,
    )

    emb = _proto_fixture(spark)
    cents = [[2.0, 0.0], [0.0, 2.0]]
    kept = prototype_prune(emb, cents, keep_frac=0.5, assign_impl="column")
    rows = kept.collect()
    sizes = {r["cell"]: 0 for r in rows}
    for r in rows:
        sizes[r["cell"]] += 1
    full = kmeans_assign(emb, cents, impl="column").groupBy("cell").count()
    for cr in full.collect():
        import math

        assert sizes[cr["cell"]] == math.ceil(0.5 * cr["count"])
    # hard mode keeps the farthest: every kept rnk run is 1..n_kept
    for cell in sizes:
        got = sorted(r["rnk"] for r in rows if r["cell"] == cell)
        assert got == list(range(1, sizes[cell] + 1))


def test_prototype_prune_easy_vs_hard_and_full(spark):
    from deltalake2db_spark.operators.kmeans import prototype_prune

    emb = _proto_fixture(spark)
    cents = [[2.0, 0.0], [0.0, 2.0]]
    hard = {r["vec_id"] for r in
            prototype_prune(emb, cents, 0.3, keep="hard",
                            assign_impl="column").collect()}
    easy = {r["vec_id"] for r in
            prototype_prune(emb, cents, 0.3, keep="easy",
                            assign_impl="column").collect()}
    assert hard and easy and hard.isdisjoint(easy)  # opposite tails
    everything = prototype_prune(emb, cents, 1.0, assign_impl="column")
    assert everything.count() == emb.count()


def test_prototype_prune_arrow_matches_column(spark):
    """The rounded-distance rank makes the GEMM path (|x|²-2xc+|c|²)
    agree with the exact column fold despite ~1e-12 cancellation."""
    from deltalake2db_spark.operators.kmeans import prototype_prune

    emb = _proto_fixture(spark)
    cents = [[2.0, 0.0], [0.0, 2.0]]
    a = sorted(
        (r["vec_id"], r["cell"], r["rnk"])
        for r in prototype_prune(emb, cents, 0.5,
                                 assign_impl="arrow").collect()
    )
    c = sorted(
        (r["vec_id"], r["cell"], r["rnk"])
        for r in prototype_prune(emb, cents, 0.5,
                                 assign_impl="column").collect()
    )
    assert a == c


def test_d4_prune_composes_dedup_then_prototypes(spark):
    import random

    from deltalake2db_spark.operators.kmeans import (
        d4_prune,
        prototype_prune,
        semantic_dedup,
    )

    rnd = random.Random(11)
    base = [[rnd.gauss(0, 1) for _ in range(6)] for _ in range(8)]
    rows = []
    for i in range(40):
        v = [x + rnd.gauss(0, 0.4) for x in base[i % 8]]
        rows.append((i, v))
    # plant exact duplicates that SemDeDup must collapse first
    rows += [(100 + i, rows[i][1]) for i in range(6)]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cents = base[:4]
    d4 = d4_prune(emb, centroids=cents, threshold=0.999, keep_frac=0.5)
    got = {r["vec_id"] for r in d4.collect()}
    # manual composition is the definition
    surv = semantic_dedup(emb, centroids=cents, threshold=0.999)
    manual = {
        r["vec_id"]
        for r in prototype_prune(
            surv.drop("cell"), cents, keep_frac=0.5
        ).collect()
    }
    assert got == manual
    assert not any(v >= 100 for v in got)   # planted dups never survive
    assert 0 < len(got) < 40
