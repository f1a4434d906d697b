"""Product quantization (PQ) — the billion-vector ANN compression.

PQ (Jégou et al., "Product Quantization for Nearest Neighbor Search",
TPAMI 2011 — the FAISS IVF-PQ building block) splits a ``dim``-vector
into ``m`` subvectors and replaces each with the id of its nearest
subspace centroid: ``dim × 8`` bytes become ``m`` small codes (32×-64×
compression at 1536-dim), and query-to-corpus distances are computed
against the CODES via an asymmetric distance computation (ADC) lookup
table — no decompression, no full-precision corpus in memory.

Spark-first design
------------------
* **Training** samples a bounded number of vectors to the driver
  (one ``limit`` probe — the codebook is a tiny model, k-means per
  subspace over a sample is the standard recipe) and returns plain
  nested lists, broadcastable anywhere.
* **Encoding** is one zero-shuffle ``mapInArrow`` pass: per batch,
  ``m`` small GEMMs against the subspace codebooks, argmin per
  subvector.  The corpus never shuffles; output is ``(id, m codes)``.
* **ADC top-k** mirrors ``similarity.brute_force_topk``'s shape: the
  (small) query set rides to every task, each Arrow batch scans only
  the CODE matrix — ``m`` vectorized table lookups per batch — and
  emits its local top-k per query; a final k-row window trims the
  union.  Shuffle volume is O(batches × Q × k), independent of corpus
  size, and the scan reads ``m`` bytes per vector instead of
  ``dim × 8``.

Determinism contract (oracle-replayable): argmin ties break to the
LOWEST code id; top-k ranks by the 4-decimal-ROUNDED ADC distance with
ascending-id tie-break — the same engine-independent ranking rule as
the cosine kernels.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def _as_codebooks(codebooks):
    import numpy as np

    cb = np.asarray(codebooks, dtype=np.float64)
    if cb.ndim != 3:
        raise ValueError(
            f"codebooks must be (m, ksub, dsub); got shape {cb.shape}"
        )
    return cb


def _reshape_vectors(col, n, dim):
    """(n, dim) float64 from a fixed-dim arrow list column — with a
    CLEAR error instead of the opaque reshape ValueError that Arrow's
    NULL-dropping ``flatten`` would otherwise produce.  NULL embeddings
    are filtered Spark-side before the kernel; a length mismatch here
    means a wrong-length vector slipped through."""
    import numpy as np

    flat = np.asarray(col.flatten()).astype(np.float64)
    if flat.size != n * dim:
        raise ValueError(
            f"pq: embedding column is not fixed-dim {dim} "
            f"(batch of {n} rows flattened to {flat.size} values — "
            "NULL or wrong-length vectors present)"
        )
    return flat.reshape(n, dim)


def _select_topk(dist_row, ids, kk):
    """Indices of the ``kk`` smallest entries by (dist ASC, id ASC) —
    deterministic under distance ties (rounded ADC distances collide
    often: vectors sharing codes share distances exactly).

    O(n) threshold partition + a lexsort over only the <=threshold
    candidates, instead of a bare ``argpartition`` (which drops the
    lowest-id tied member at the k boundary — ADVICE r9)."""
    import numpy as np

    n = len(dist_row)
    kk = min(kk, n)
    if kk <= 0:
        return np.empty(0, dtype=np.int64)
    t = np.partition(dist_row, kk - 1)[kk - 1]
    cand = np.flatnonzero(dist_row <= t)
    order = cand[np.lexsort((ids[cand], dist_row[cand]))]
    return order[:kk]


def pq_train(
    df: DataFrame,
    m: int = 8,
    ksub: int = 16,
    iters: int = 5,
    vec_col: str = "embedding",
    sample: int = 100_000,
    sample_max_bytes: int = 256 << 20,
) -> list:
    """Per-subspace k-means codebooks ``(m, ksub, dsub)`` as nested
    lists.

    Deterministic: the sample is the first ``sample`` rows of ``df``'s
    current ordering (pass a sorted frame for full reproducibility) and
    init takes the first ``ksub`` sampled subvectors; Lloyd iterations
    run in numpy on the driver.  Empty clusters keep their previous
    centroid (FAISS does the same).

    The driver sample is bounded by BYTES as well as rows: ``dim`` is
    probed from one row first and the row cap shrinks to
    ``sample_max_bytes / (dim * 8)`` before collecting, so a 1536-dim
    corpus cannot materialize ``sample`` × 12 KB on the driver (same
    clamp as ``kmeans.semantic_dedup_against``'s broadcast-ref probe).
    """
    import numpy as np

    probe = df.select(vec_col).filter(F.col(vec_col).isNotNull()).first()
    if probe is None:
        raise ValueError("pq_train: empty input")
    dim_probe = len(probe[0])
    if dim_probe > 0:
        sample = min(sample, max(ksub, sample_max_bytes // (dim_probe * 8)))
    rows = (
        df.select(vec_col)
        .filter(F.col(vec_col).isNotNull())
        .limit(sample)
        .collect()
    )
    if not rows:
        raise ValueError("pq_train: empty input")
    X = np.array([np.asarray(r[0], dtype=np.float64) for r in rows])
    dim = X.shape[1]
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    dsub = dim // m
    books = []
    for s in range(m):
        Xs = X[:, s * dsub : (s + 1) * dsub]
        cents = Xs[:ksub].copy()
        if len(cents) < ksub:
            raise ValueError(f"need >= ksub={ksub} sample rows")
        for _ in range(iters):
            d = -2.0 * (Xs @ cents.T) + (cents * cents).sum(axis=1)[None, :]
            a = np.argmin(d, axis=1)
            for c in range(ksub):
                mask = a == c
                if mask.any():
                    cents[c] = Xs[mask].mean(axis=0)
        books.append(cents.tolist())
    return books


def pq_encode(
    df: DataFrame,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    out: str = "pq_code",
) -> DataFrame:
    """``(id, pq_code array<int>)`` — nearest subspace centroid per
    subvector, ties to the lowest code.  One map-only Arrow stage.

    NULL embeddings are dropped Spark-side before the kernel (the
    documented skip behavior shared with ``knn_classify``); a
    wrong-length vector raises a clear per-batch error instead of an
    opaque reshape failure (ADVICE r9)."""
    import numpy as np

    cb = _as_codebooks(codebooks)
    m, ksub, dsub = cb.shape
    dim = m * dsub
    c_sq = (cb * cb).sum(axis=2)  # (m, ksub)
    id_field = df.schema[id_col]
    out_schema = (
        f"`{id_col}` {id_field.dataType.simpleString()}, {out} array<int>"
    )

    def encode(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            # fixed-dim list column: flatten+reshape, no python lists
            X = _reshape_vectors(b.column(1), n, dim)
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                # argmin needs only -2x·c + |c|² (|x|² constant per row)
                d = -2.0 * (Xs @ cb[s].T) + c_sq[s][None, :]
                codes[:, s] = np.argmin(d, axis=1)
            arr = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * m),
                pa.array(codes.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(0), arr], names=[id_col, out]
            )

    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .mapInArrow(encode, out_schema)
    )


def pq_topk(
    codes_df: DataFrame,
    queries: DataFrame,
    codebooks,
    k: int = 5,
    id_col: str = "vec_id",
    code_col: str = "pq_code",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """ADC top-k: ``(query_id, id, dist, rank)`` — smallest approximate
    squared-L2 first, rounded to 4 decimals, ascending-id tie-break;
    the query's own id is excluded.

    The query set is collected (small by construction — same bound
    story as ``brute_force_topk``); each Arrow batch of the CODED
    corpus does ``m`` LUT gathers per query and emits its local top-k.

    Ids keep their native type: the output schema is built from the
    input frames' id columns (string doc ids work, ADVICE r9) and the
    kernel emits ids via arrow ``take`` — no int64 coercion.
    """
    import numpy as np

    cb = _as_codebooks(codebooks)
    m, ksub, dsub = cb.shape
    from pyspark.sql.pandas.types import to_arrow_type

    qid_t = queries.schema[id_col].dataType.simpleString()
    cid_t = codes_df.schema[id_col].dataType.simpleString()
    qid_at = to_arrow_type(queries.schema[id_col].dataType)
    out_schema = f"`{query_id_col}` {qid_t}, `{id_col}` {cid_t}, dist double"
    qrows = queries.select(id_col, vec_col).collect()
    spark = codes_df.sparkSession
    if not qrows:
        return spark.createDataFrame([], schema=out_schema + ", rank int")
    qids = np.array([r[0] for r in qrows])
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    # LUT[q, s, c] = ||q_s - cb[s][c]||² — built once on the driver,
    # rides in the task closure (Q × m × ksub doubles: tiny)
    lut = np.empty((len(Q), m, ksub), dtype=np.float64)
    for s in range(m):
        Qs = Q[:, s * dsub : (s + 1) * dsub]
        diff = Qs[:, None, :] - cb[s][None, :, :]
        lut[:, s, :] = (diff * diff).sum(axis=2)

    def scan(batches):
        import pyarrow as pa

        qid_arr = pa.array(qids.tolist(), type=qid_at)
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            C = np.asarray(b.column(1).flatten()).reshape(n, m)
            ids = np.asarray(b.column(0))
            # dist (Q, n): m vectorized gathers
            dist = lut[:, 0, :][:, C[:, 0]]
            for s in range(1, m):
                dist = dist + lut[:, s, :][:, C[:, s]]
            dist = np.round(dist, 4)
            qi, ci = [], []
            for qn in range(len(qids)):
                # k+1 allows dropping the self row; (dist, id) lexsort
                # keeps tied boundary members deterministic
                for j in _select_topk(dist[qn], ids, k + 1):
                    if ids[j] != qids[qn]:
                        qi.append(qn)
                        ci.append(int(j))
            qi = np.asarray(qi, dtype=np.int64)
            ci = pa.array(np.asarray(ci, dtype=np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    qid_arr.take(pa.array(qi)),
                    b.column(0).take(ci),
                    pa.array(dist[qi, np.asarray(ci)]),
                ],
                names=[query_id_col, id_col, "dist"],
            )

    scored = codes_df.select(id_col, code_col).mapInArrow(scan, out_schema)
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist", "rank")
    )


def build_ivf_pq_index(
    df: DataFrame,
    centroids,
    codebooks,
    path: str,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    mode: str = "overwrite",
):
    """Materialize the IVF-PQ index as a Delta table
    ``(id, pq_code array<int>)`` PARTITIONED BY ``cell``.

    One fused Arrow pass assigns every vector to its squared-L2-closest
    coarse cell (ties to the lowest cell) and PQ-encodes it; the write
    is ``partitionBy('cell')`` through the Delta sink, so a search
    probing ``nprobe`` cells PRUNES FILES at the log level — the honest
    at-rest layout the in-pass masks of ``ivf_pq_topk``/``ivf_topk``
    approximate for single-pass use.  Index bytes: ``m`` codes + one
    id per vector (the raw vectors stay behind); at 10⁹ vectors × m=8
    that is a ~16 GB index for a ~4 TB float corpus."""
    from ..sources.delta_sink import write_delta

    encoded = ivf_pq_encode(df, centroids, codebooks, id_col, vec_col)
    write_delta(encoded, path, partition_by=["cell"], mode=mode)


def ivf_pq_encode(
    df: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> DataFrame:
    """``(id, cell, pq_code)`` rows: ONE fused Arrow pass assigns each
    vector to its squared-L2-closest coarse cell (ties to the lowest
    cell) and PQ-encodes it — the shared encoder behind the index
    build and the incremental upsert."""
    import numpy as np

    cb = _as_codebooks(codebooks)
    m, ksub, dsub = cb.shape
    dim = m * dsub
    cents = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cents * cents).sum(axis=1)
    c_sq = (cb * cb).sum(axis=2)
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_t}, cell int, pq_code array<int>"

    def encode(batches):
        import pyarrow as pa

        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            X = _reshape_vectors(b.column(1), n, dim)
            cell = np.argmin(
                -2.0 * (X @ cents.T) + cent_sq[None, :], axis=1
            ).astype(np.int32)
            codes = np.empty((n, m), dtype=np.int32)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = np.argmin(
                    -2.0 * (Xs @ cb[s].T) + c_sq[s][None, :], axis=1
                )
            arr = pa.ListArray.from_arrays(
                pa.array(np.arange(n + 1, dtype=np.int32) * m),
                pa.array(codes.ravel()),
            )
            yield pa.RecordBatch.from_arrays(
                [b.column(0), pa.array(cell), arr],
                names=[id_col, "cell", "pq_code"],
            )

    return (
        df.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .mapInArrow(encode, out_schema)
    )


def upsert_ivf_pq_index(
    spark,
    path: str,
    df: DataFrame,
    centroids,
    codebooks,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> dict:
    """Incremental index maintenance — NO rebuild: encode only the
    given new/changed vectors (same fused Arrow pass as the build) and
    MERGE them into the cell-partitioned Delta index keyed on
    ``id_col``: changed vectors update in place (moving cells
    atomically when their nearest centroid changed), new ids insert,
    and cells untouched by the batch keep their files — so the
    search's log-level ``cell IN probes`` pruning stays effective as
    the index grows.  After the upsert the index is byte-equivalent to
    a fresh build over the updated corpus (the q_ivf_pq_upsert gate
    proves it by matching the rebuild oracle).  Returns the merge
    stats dict."""
    from ..sources.maintenance import merge_into

    encoded = ivf_pq_encode(df, centroids, codebooks, id_col, vec_col)
    return merge_into(spark, path, encoded, on=[id_col])


def ivf_pq_index_topk(
    spark,
    path: str,
    queries: DataFrame,
    codebooks,
    centroids,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """Search a ``build_ivf_pq_index`` table: queries are routed on the
    driver (same rounded-distance/lowest-cell rule as ``ivf_pq_topk``),
    the UNION of probed cells becomes a partition-pruning ``cell IN``
    condition on the Delta scan — files of unprobed cells are never
    opened — and one Arrow pass over the surviving PQ codes sums the
    ADC lookup tables and emits batch-local top-k, trimmed by a final
    k-row window.  Identical determinism contract (and results) as the
    single-pass ``ivf_pq_topk``."""
    import numpy as np

    from pyspark.sql.pandas.types import to_arrow_type

    from ..sources.delta import scan_delta

    cb = _as_codebooks(codebooks)
    m, ksub, dsub = cb.shape
    cents = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cents * cents).sum(axis=1)
    qid_t = queries.schema[id_col].dataType.simpleString()
    qid_at = to_arrow_type(queries.schema[id_col].dataType)
    qrows = queries.select(id_col, vec_col).collect()
    if not qrows:
        return spark.createDataFrame(
            [],
            schema=(
                f"`{query_id_col}` {qid_t}, `{id_col}` {qid_t}, "
                "dist double, rank int"
            ),
        )
    qids = np.array([r[0] for r in qrows])
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    qd = np.round(
        (Q * Q).sum(axis=1)[:, None] - 2.0 * (Q @ cents.T) + cent_sq[None, :],
        4,
    )
    probes = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
    probed = sorted({int(c) for row in probes for c in row})
    lut = np.empty((len(Q), m, ksub), dtype=np.float64)
    for s in range(m):
        Qs = Q[:, s * dsub : (s + 1) * dsub]
        diff = Qs[:, None, :] - cb[s][None, :, :]
        lut[:, s, :] = (diff * diff).sum(axis=2)

    codes_df = scan_delta(
        spark, path, conditions=[("cell", "in", probed)]
    )
    cid_t = codes_df.schema[id_col].dataType.simpleString()
    out_schema = f"`{query_id_col}` {qid_t}, `{id_col}` {cid_t}, dist double"

    def scan(batches):
        import pyarrow as pa

        qid_arr = pa.array(qids.tolist(), type=qid_at)
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            ids = np.asarray(b.column(0))
            cells = np.asarray(b.column(1))
            C = np.asarray(b.column(2).flatten()).reshape(n, m)
            dist = lut[:, 0, :][:, C[:, 0]]
            for s in range(1, m):
                dist = dist + lut[:, s, :][:, C[:, s]]
            dist = np.round(dist, 4)
            qi, ci = [], []
            for qn in range(len(qids)):
                cand = np.flatnonzero(
                    np.isin(cells, probes[qn]) & (ids != qids[qn])
                )
                if not len(cand):
                    continue
                top = cand[_select_topk(dist[qn, cand], ids[cand], k)]
                qi.extend([qn] * len(top))
                ci.extend(top.tolist())
            qi = np.asarray(qi, dtype=np.int64)
            ci = pa.array(np.asarray(ci, dtype=np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    qid_arr.take(pa.array(qi)),
                    b.column(0).take(ci),
                    pa.array(dist[qi, np.asarray(ci)]),
                ],
                names=[query_id_col, id_col, "dist"],
            )

    scored = codes_df.select(id_col, "cell", "pq_code").mapInArrow(
        scan, out_schema
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist", "rank")
    )


def ivf_pq_topk(
    corpus: DataFrame,
    queries: DataFrame,
    centroids,
    codebooks,
    k: int = 5,
    nprobe: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    query_id_col: str = "query_id",
) -> DataFrame:
    """The complete billion-vector search primitive: IVF routing
    (each query probes only the ``nprobe`` squared-L2-closest cells)
    over a PQ-coded corpus (ADC distances, never full precision).

    Fused ONE Arrow pass over the raw corpus, same shape as
    ``similarity.ivf_topk``: each batch assigns its vectors to cells
    (one GEMM argmin against the broadcast centroids, ties to the
    lowest cell), PQ-encodes them (``m`` sub-GEMMs), masks each
    query's candidates to its probed cells, sums ADC lookup tables
    over the candidate codes, and emits a batch-local top-k; a final
    k-row window merges partials.  The corpus never shuffles.  In a
    real deployment the coded index is written ``partitionBy('cell')``
    so probes prune FILES; the in-pass mask is the honest single-pass
    equivalent (same note as ``ivf_topk``).

    Determinism contract: routing compares 4-decimal-ROUNDED query-to-
    centroid distances with lowest-cell ties; ADC ranks the rounded
    distance with ascending-id ties; the query's own id is excluded.
    """
    import numpy as np

    from pyspark.sql.pandas.types import to_arrow_type

    cb = _as_codebooks(codebooks)
    m, ksub, dsub = cb.shape
    dim = m * dsub
    cents = np.asarray(centroids, dtype=np.float64)
    cent_sq = (cents * cents).sum(axis=1)
    c_sq = (cb * cb).sum(axis=2)
    qid_t = queries.schema[id_col].dataType.simpleString()
    cid_t = corpus.schema[id_col].dataType.simpleString()
    qid_at = to_arrow_type(queries.schema[id_col].dataType)
    out_schema = f"`{query_id_col}` {qid_t}, `{id_col}` {cid_t}, dist double"
    qrows = queries.select(id_col, vec_col).collect()
    spark = corpus.sparkSession
    if not qrows:
        return spark.createDataFrame([], schema=out_schema + ", rank int")
    qids = np.array([r[0] for r in qrows])
    Q = np.array([np.asarray(r[1], dtype=np.float64) for r in qrows])
    # routing: nprobe closest cells per query (rounded dist, cell asc —
    # see ivf_topk's routing note on why rounding makes the argsort
    # engine-independent)
    qd = np.round(
        (Q * Q).sum(axis=1)[:, None] - 2.0 * (Q @ cents.T) + cent_sq[None, :],
        4,
    )
    # stable sort: equal rounded distances keep cell-ascending order
    probes = np.argsort(qd, axis=1, kind="stable")[:, :nprobe]
    lut = np.empty((len(Q), m, ksub), dtype=np.float64)
    for s in range(m):
        Qs = Q[:, s * dsub : (s + 1) * dsub]
        diff = Qs[:, None, :] - cb[s][None, :, :]
        lut[:, s, :] = (diff * diff).sum(axis=2)

    def scan(batches):
        import pyarrow as pa

        qid_arr = pa.array(qids.tolist(), type=qid_at)
        for b in batches:
            n = b.num_rows
            if n == 0:
                continue
            X = _reshape_vectors(b.column(1), n, dim)
            ids = np.asarray(b.column(0))
            cell = np.argmin(
                -2.0 * (X @ cents.T) + cent_sq[None, :], axis=1
            )
            codes = np.empty((n, m), dtype=np.int64)
            for s in range(m):
                Xs = X[:, s * dsub : (s + 1) * dsub]
                codes[:, s] = np.argmin(
                    -2.0 * (Xs @ cb[s].T) + c_sq[s][None, :], axis=1
                )
            dist = lut[:, 0, :][:, codes[:, 0]]
            for s in range(1, m):
                dist = dist + lut[:, s, :][:, codes[:, s]]
            dist = np.round(dist, 4)
            qi, ci = [], []
            for qn in range(len(qids)):
                cand = np.flatnonzero(
                    np.isin(cell, probes[qn]) & (ids != qids[qn])
                )
                if not len(cand):
                    continue
                # (dist, id) lexsorted batch-local top-k over the
                # probed candidates — tied boundary rows stay
                # deterministic (ADVICE r9)
                top = cand[
                    _select_topk(dist[qn, cand], ids[cand], k)
                ]
                qi.extend([qn] * len(top))
                ci.extend(top.tolist())
            qi = np.asarray(qi, dtype=np.int64)
            ci = pa.array(np.asarray(ci, dtype=np.int64))
            yield pa.RecordBatch.from_arrays(
                [
                    qid_arr.take(pa.array(qi)),
                    b.column(0).take(ci),
                    pa.array(dist[qi, np.asarray(ci)]),
                ],
                names=[query_id_col, id_col, "dist"],
            )

    scored = (
        corpus.filter(F.col(vec_col).isNotNull())
        .select(id_col, vec_col)
        .mapInArrow(scan, out_schema)
    )
    w = Window.partitionBy(query_id_col).orderBy(
        F.col("dist").asc(), F.col(id_col).asc()
    )
    return (
        scored.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
        .select(query_id_col, id_col, "dist", "rank")
    )
