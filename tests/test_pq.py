"""Product-quantization operator tests (operators/pq.py)."""

from __future__ import annotations

import math
import random

import pytest

from pyspark.sql import functions as F

from deltalake2db_spark.operators import pq as P


def _vecs(n, dim, seed=3):
    rnd = random.Random(seed)
    return [(i, [rnd.gauss(0, 1) for _ in range(dim)]) for i in range(n)]


def test_pq_encode_hand_case(spark):
    """2 subspaces × 2 codes with obvious nearest centroids."""
    cb = [
        [[0.0, 0.0], [10.0, 10.0]],  # subspace 0
        [[0.0, 0.0], [-10.0, -10.0]],  # subspace 1
    ]
    df = spark.createDataFrame(
        [
            (1, [0.1, -0.1, -9.0, -11.0]),  # sub0 -> 0, sub1 -> 1
            (2, [9.5, 10.5, 0.2, 0.0]),     # sub0 -> 1, sub1 -> 0
        ],
        ["vec_id", "embedding"],
    )
    got = {r["vec_id"]: r["pq_code"] for r in P.pq_encode(df, cb).collect()}
    assert got == {1: [0, 1], 2: [1, 0]}


def test_pq_encode_tie_breaks_low_code(spark):
    """Equidistant subvector -> the LOWER code id wins."""
    cb = [[[1.0], [-1.0]]]
    df = spark.createDataFrame([(7, [0.0])], ["vec_id", "embedding"])
    assert P.pq_encode(df, cb).collect()[0]["pq_code"] == [0]


def test_pq_topk_matches_numpy_adc(spark):
    """Distributed ADC top-k equals a straightforward driver replay."""
    import numpy as np

    dim, m, ksub, k = 16, 4, 8, 5
    rows = _vecs(60, dim)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = P.pq_train(df.orderBy("vec_id"), m=m, ksub=ksub, iters=3)
    codes = P.pq_encode(df, cb)
    queries = df.filter(F.col("vec_id") < 3)
    got = [
        (r["query_id"], r["rank"], r["vec_id"], r["dist"])
        for r in P.pq_topk(codes, queries, cb, k=k).collect()
    ]

    cbn = np.asarray(cb)
    X = np.array([v for _, v in rows])
    dsub = dim // m
    C = np.stack(
        [
            np.argmin(
                ((X[:, s * dsub:(s + 1) * dsub][:, None, :]
                  - cbn[s][None, :, :]) ** 2).sum(-1),
                axis=1,
            )
            for s in range(m)
        ],
        axis=1,
    )
    want = []
    for qid in range(3):
        q = X[qid]
        d = np.zeros(len(rows))
        for s in range(m):
            d += (
                (q[s * dsub:(s + 1) * dsub] - cbn[s][C[:, s]]) ** 2
            ).sum(-1)
        d = np.round(d, 4)
        order = sorted(
            (i for i in range(len(rows)) if i != qid),
            key=lambda i: (d[i], i),
        )[:k]
        want += [(qid, r + 1, i, float(d[i])) for r, i in enumerate(order)]
    assert sorted(got) == sorted(want)


def test_pq_topk_empty_queries(spark):
    df = spark.createDataFrame(_vecs(10, 8), ["vec_id", "embedding"])
    cb = P.pq_train(df.orderBy("vec_id"), m=2, ksub=4, iters=2)
    codes = P.pq_encode(df, cb)
    out = P.pq_topk(codes, df.filter(F.col("vec_id") < 0), cb, k=3)
    assert out.count() == 0
    assert out.columns == ["query_id", "vec_id", "dist", "rank"]


def test_pq_train_shapes_and_compression(spark):
    df = spark.createDataFrame(_vecs(40, 16), ["vec_id", "embedding"])
    cb = P.pq_train(df.orderBy("vec_id"), m=4, ksub=8, iters=2)
    assert len(cb) == 4 and len(cb[0]) == 8 and len(cb[0][0]) == 4
    # encoding quality sanity: ADC distance to self through the codes
    # is finite and small relative to vector norms
    codes = {r["vec_id"]: r["pq_code"] for r in P.pq_encode(df, cb).collect()}
    assert all(len(c) == 4 and all(0 <= x < 8 for x in c) for c in codes.values())


def test_ivf_pq_topk_matches_numpy(spark):
    """Fused IVF routing + ADC equals a driver replay: per query only
    vectors in the 2 probed cells are ranked, by rounded ADC dist."""
    import numpy as np

    dim, m, ksub, ncells, k, nprobe = 16, 4, 8, 4, 3, 2
    rows = _vecs(80, dim, seed=9)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    ordered = df.orderBy("vec_id")
    cb = P.pq_train(ordered, m=m, ksub=ksub, iters=3)
    cents = [v for _, v in rows[:ncells]]
    queries = df.filter(F.col("vec_id") < 3)
    got = sorted(
        (r["query_id"], r["rank"], r["vec_id"], r["dist"])
        for r in P.ivf_pq_topk(df, queries, cents, cb, k=k, nprobe=nprobe).collect()
    )

    X = np.array([v for _, v in rows])
    C = np.asarray(cents)
    cbn = np.asarray(cb)
    dsub = dim // m
    cell = np.argmin(
        ((X[:, None, :] - C[None, :, :]) ** 2).sum(-1), axis=1
    )
    codes = np.stack(
        [
            np.argmin(
                ((X[:, s * dsub:(s + 1) * dsub][:, None, :]
                  - cbn[s][None, :, :]) ** 2).sum(-1),
                axis=1,
            )
            for s in range(m)
        ],
        axis=1,
    )
    want = []
    for qid in range(3):
        q = X[qid]
        qd = np.round(((q[None, :] - C) ** 2).sum(-1), 4)
        probed = set(np.argsort(qd, kind="stable")[:nprobe].tolist())
        d = np.zeros(len(rows))
        for s in range(m):
            d += ((q[s * dsub:(s + 1) * dsub] - cbn[s][codes[:, s]]) ** 2).sum(-1)
        d = np.round(d, 4)
        cand = [i for i in range(len(rows)) if cell[i] in probed and i != qid]
        order = sorted(cand, key=lambda i: (d[i], i))[:k]
        want += [(qid, r + 1, i, float(d[i])) for r, i in enumerate(order)]
    assert got == sorted(want)


def test_pq_train_validates(spark):
    df = spark.createDataFrame(_vecs(5, 10), ["vec_id", "embedding"])
    with pytest.raises(ValueError, match="divisible"):
        P.pq_train(df, m=3, ksub=2)
    with pytest.raises(ValueError, match="ksub"):
        P.pq_train(df, m=2, ksub=32)


def test_pq_topk_tie_break_at_k_boundary(spark):
    """Rounded-ADC ties at the k boundary keep the LOWEST ids (r9
    ADVICE: bare argpartition dropped tied low-id members).  One
    1-subspace codebook makes every same-code vector share a distance
    exactly."""
    cb = [[[0.0, 0.0], [10.0, 10.0]]]
    # vec 1 near code 0; vecs 5..9 all code 1 (identical ADC distance)
    rows = [(1, [0.2, 0.2])] + [
        (i, [10.0 + 0.01 * (i % 3), 10.0]) for i in range(5, 10)
    ]
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    codes = P.pq_encode(df, cb)
    queries = spark.createDataFrame([(100, [0.0, 0.0])], ["vec_id", "embedding"])
    got = [
        (r["rank"], r["vec_id"])
        for r in P.pq_topk(codes, queries, cb, k=3).collect()
    ]
    # rank 1 = vec 1 (code 0); ranks 2-3 = the two LOWEST tied ids
    assert got == [(1, 1), (2, 5), (3, 6)]


def test_pq_topk_string_ids(spark):
    """Non-bigint id columns survive both sides (r9 ADVICE: int64
    coercion corrupted string doc ids)."""
    cb = [[[0.0, 0.0], [10.0, 10.0]]]
    df = spark.createDataFrame(
        [("a", [0.1, 0.0]), ("b", [10.0, 10.0]), ("c", [9.9, 10.1])],
        ["vec_id", "embedding"],
    )
    codes = P.pq_encode(df, cb)
    queries = spark.createDataFrame([("q1", [10.0, 10.0])], ["vec_id", "embedding"])
    out = P.pq_topk(codes, queries, cb, k=2)
    assert dict(out.dtypes)["vec_id"] == "string"
    assert dict(out.dtypes)["query_id"] == "string"
    got = [(r["rank"], r["vec_id"]) for r in out.collect()]
    # b and c share code 1 -> tied ADC distance -> id ASC
    assert got == [(1, "b"), (2, "c")]


def test_pq_encode_drops_null_embeddings(spark):
    """NULL embeddings are skipped Spark-side (knn_classify contract),
    not an opaque reshape error."""
    cb = [[[0.0, 0.0], [10.0, 10.0]]]
    df = spark.createDataFrame(
        [(1, [0.1, 0.0]), (2, None), (3, [10.0, 10.0])],
        "vec_id long, embedding array<double>",
    )
    got = {r["vec_id"]: r["pq_code"] for r in P.pq_encode(df, cb).collect()}
    assert got == {1: [0], 3: [1]}


def test_pq_train_byte_bound_caps_sample(spark):
    """The driver sample shrinks to sample_max_bytes/(dim*8) rows —
    same clamp class as the decontam broadcast-ref probe."""
    dim = 16
    df = spark.createDataFrame(_vecs(200, dim), ["vec_id", "embedding"])
    # 4 rows' worth of bytes, but ksub=4 forces at least ksub rows
    cb = P.pq_train(
        df.orderBy("vec_id"), m=2, ksub=4, iters=1,
        sample_max_bytes=4 * dim * 8,
    )
    import numpy as np

    assert np.asarray(cb).shape == (2, 4, dim // 2)


def test_ivf_pq_index_matches_single_pass(spark, tmp_path):
    """The at-rest index path (build partitionBy(cell) + pruning scan)
    returns exactly the single-pass ivf_pq_topk results."""
    import numpy as np

    dim, m, ksub = 16, 4, 8
    rows = _vecs(80, dim)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = P.pq_train(df.orderBy("vec_id"), m=m, ksub=ksub, iters=3)
    cents = [v for _, v in rows[:6]]
    queries = df.filter(F.col("vec_id") < 3)
    path = str(tmp_path / "ivfpq")
    P.build_ivf_pq_index(df, cents, cb, path)
    got = sorted(
        map(tuple, P.ivf_pq_index_topk(
            spark, path, queries, cb, cents, k=4, nprobe=2).collect())
    )
    want = sorted(
        map(tuple, P.ivf_pq_topk(
            df, queries, cents, cb, k=4, nprobe=2).collect())
    )
    assert got == want and len(got) > 0


def test_ivf_pq_index_upsert_converges_and_is_incremental(spark, tmp_path):
    """upsert_ivf_pq_index == fresh rebuild on the updated corpus, and
    the merge rewrites ONLY the files of cells the batch touches —
    untouched cells keep their exact parquet files."""
    import os

    from deltalake2db_spark.plans.meta import get_meta

    dim, m, ksub = 16, 4, 8
    rows = _vecs(80, dim, seed=3)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = P.pq_train(df.orderBy("vec_id"), m=m, ksub=ksub, iters=3)
    cents = [v for _, v in rows[:6]]
    queries = df.filter(F.col("vec_id") < 3)

    # corrupted start state: ids < 5 carry a neighbor's embedding,
    # ids 70+ missing entirely
    wrong = spark.createDataFrame(
        [(i, rows[i + 20][1]) for i in range(5)], ["vec_id", "embedding"]
    )
    stale = df.filter(
        (F.col("vec_id") >= 5) & (F.col("vec_id") < 70)
    ).unionByName(wrong)
    path = str(tmp_path / "ivfpq_up")
    P.build_ivf_pq_index(stale, cents, cb, path)
    files_before = set(get_meta(path).add_actions)

    fixes = df.filter((F.col("vec_id") < 5) | (F.col("vec_id") >= 70))
    stats = P.upsert_ivf_pq_index(spark, path, fixes, cents, cb)
    assert stats  # merge commit happened

    got = sorted(map(tuple, P.ivf_pq_index_topk(
        spark, path, queries, cb, cents, k=4, nprobe=3).collect()))
    fresh = str(tmp_path / "ivfpq_fresh")
    P.build_ivf_pq_index(df, cents, cb, fresh)
    want = sorted(map(tuple, P.ivf_pq_index_topk(
        spark, fresh, queries, cb, cents, k=4, nprobe=3).collect()))
    assert got == want and len(got) > 0

    # incrementality: cells untouched by the batch keep their files
    touched_cells = {
        r["cell"] for r in P.ivf_pq_encode(fixes, cents, cb)
        .select("cell").distinct().collect()
    }
    files_after = set(get_meta(path).add_actions)
    survivors = files_before & files_after
    assert survivors, "merge rewrote every file — not incremental"
    from urllib.parse import unquote

    for f in files_before - files_after:  # rewritten ones
        cell = int(unquote(f).split("cell=")[1].split("/")[0])
        assert cell in touched_cells, (f, touched_cells)


def test_ivf_pq_index_prunes_unprobed_cells(spark, tmp_path):
    """Files of unprobed cells are NEVER opened: corrupting every
    parquet under an unprobed cell's partition directory leaves the
    search result unchanged."""
    import os

    dim = 8
    rows = _vecs(60, dim, seed=9)
    df = spark.createDataFrame(rows, ["vec_id", "embedding"])
    cb = P.pq_train(df.orderBy("vec_id"), m=2, ksub=4, iters=2)
    cents = [v for _, v in rows[:6]]
    queries = df.filter(F.col("vec_id") < 2)
    path = str(tmp_path / "ivfpq")
    P.build_ivf_pq_index(df, cents, cb, path)
    before = sorted(map(tuple, P.ivf_pq_index_topk(
        spark, path, queries, cb, cents, k=3, nprobe=2).collect()))
    # find a cell no query probes
    import numpy as np

    C = np.asarray(cents, dtype=np.float64)
    Q = np.array([v for i, v in rows if i < 2])
    qd = np.round((Q*Q).sum(1)[:, None] - 2.0*(Q @ C.T) + (C*C).sum(1)[None, :], 4)
    probed = {int(c) for r in np.argsort(qd, 1, kind="stable")[:, :2] for c in r}
    unprobed = [c for c in range(len(cents)) if c not in probed]
    corrupted = 0
    for c in unprobed:
        pdir = os.path.join(path, f"cell={c}")
        if os.path.isdir(pdir):
            for f in os.listdir(pdir):
                if f.endswith(".parquet"):
                    with open(os.path.join(pdir, f), "wb") as fh:
                        fh.write(b"ruined")
                    corrupted += 1
    assert corrupted > 0  # the test must actually corrupt something
    after = sorted(map(tuple, P.ivf_pq_index_topk(
        spark, path, queries, cb, cents, k=3, nprobe=2).collect()))
    assert after == before
