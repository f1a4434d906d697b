"""Benchmark-contamination detection: word n-gram overlap.

Training corpora must be screened against evaluation benchmarks —
a document sharing long verbatim n-grams with a benchmark item leaks
test data into training.  The standard check (GPT-3 appendix C,
PaLM/Llama data cards) flags documents whose word n-grams collide with
any benchmark n-gram.

Spark-first design
------------------
* The benchmark side is small by contract (eval suites are thousands
  of items), so the default path broadcasts its distinct gram-hash set
  and screens the corpus in ONE zero-shuffle vectorized ``mapInPandas``
  stage — the corpus is never joined, shuffled, or collected
  (``contamination_check(impl=...)`` docstring has the full story).
* The fully-general fallback is an **equi-join on the gram hash**,
  i.e. an inverted-index probe — never a doc × benchmark cross
  product; the corpus shuffles once, keyed by ``doc_id``.
* Counts are distinct-gram counts, so repeated boilerplate inside one
  document doesn't inflate the contamination score.

Grams travel as 64-bit hashes (8 bytes, never gram strings); counting
distinct hashes equals counting distinct grams for any
injective-in-practice 64-bit hash, so the concrete hash function is an
internal detail per path (xxhash64 fold JVM-side, FNV-1a fold in the
Arrow kernel).
"""

from __future__ import annotations

import numpy as np

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def word_ngrams(df: DataFrame, text_col: str, n: int, out: str = "gram"):
    """Explode whitespace word ``n``-grams of ``text_col``.

    ``split`` runs once per row; gram assembly is ``array_join(slice)``
    over a ``sequence`` — all built-in, whole-stage codegen.
    Documents shorter than ``n`` words produce no grams.
    """
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    # sequence(1, 0) descends in Spark — short docs need the empty branch
    grams = F.when(
        F.size(words) >= n,
        F.transform(
            F.sequence(F.lit(1), F.size(words) - (n - 1)),
            lambda i: F.array_join(F.slice(words, i, n), " "),
        ),
    ).otherwise(F.array().cast("array<string>"))
    return df.withColumn(out, F.explode(grams))


def word_ngram_hashes(text_col, n: int):
    """Array of 64-bit word-n-gram hashes — same tokenization as
    ``word_ngrams`` (trim + ``\\s+`` split, NO lowercasing) but each
    word is xxhash64'd once and n consecutive word hashes fold with
    rotate-xor instead of materializing gram strings (the same
    arithmetic scheme as ``dedup.shingle_hash_array``; collision-free
    in practice at 64 bits, and token boundaries are unambiguous
    because the fold runs over the word-hash sequence)."""
    rotl = lambda c, k: F.shiftleft(c, k).bitwiseOR(  # noqa: E731
        F.shiftrightunsigned(c, 64 - k)
    )
    words = F.split(F.trim(text_col), "\\s+")
    wh = F.transform(words, lambda w: F.xxhash64(w))
    acc = wh
    for i in range(1, n):
        rest = F.slice(wh, i + 1, F.greatest(F.size(wh) - i, F.lit(0)))
        acc = F.zip_with(acc, rest, lambda a, b: rotl(a, 13).bitwiseXOR(b))
    if n > 1:
        acc = F.filter(acc, lambda x: x.isNotNull())
    return acc


# --------------------------------------------------------------------
# numpy n-gram kernel (shared by the Arrow fast path's driver-side
# benchmark build, its executor-side mapInArrow batches, and
# quality.repetition_metrics)
# --------------------------------------------------------------------

_FNV_OFF = np.uint64(0xCBF29CE484222325)
_FNV_PRIME = np.uint64(0x100000001B3)


def _token_hashes_flat(flat) -> np.ndarray:
    """Vectorized FNV-1a-64 over each token of a pyarrow string array.

    Reads the Arrow offsets/data buffers directly (zero-copy) and
    hashes column-wise: round ``c`` gathers byte ``c`` of every token
    still longer than ``c`` — total gather work is ``sum(len(token))``,
    never ``n_tokens × max_len``.  Each token's fold stops at its OWN
    byte length, so the hash is independent of the batch it rode in.
    """
    import pyarrow as pa

    ntok = len(flat)
    if ntok == 0:
        return np.empty(0, dtype=np.uint64)
    off_dtype = np.int64 if pa.types.is_large_string(flat.type) else np.int32
    bufs = flat.buffers()
    offs = np.frombuffer(bufs[1], dtype=off_dtype)[
        flat.offset : flat.offset + ntok + 1
    ].astype(np.int64)
    data = np.frombuffer(bufs[2], dtype=np.uint8)
    lengths = offs[1:] - offs[:-1]
    starts = offs[:-1]
    width = int(lengths.max(initial=0))
    h = np.full(ntok, _FNV_OFF, dtype=np.uint64)
    with np.errstate(over="ignore"):
        for c in range(width):
            v = lengths > c
            if v.all():
                h = (h ^ data[starts + c].astype(np.uint64)) * _FNV_PRIME
            else:
                sv = starts[v]
                h[v] = (h[v] ^ data[sv + c].astype(np.uint64)) * _FNV_PRIME
    return h


def _np_rotl(x: np.ndarray, k: int) -> np.ndarray:
    k = np.uint64(k)
    return (x << k) | (x >> np.uint64(64 - k))


def _word_hash_stream(texts):
    """``(doc_idx, word_hash)`` arrays for the tokenized ``texts`` —
    the tokenize+hash half of ``_gram_stream``, reusable across several
    gram orders over one batch (quality.repetition_metrics folds n=1/2/3
    from ONE tokenization)."""
    import pyarrow as pa
    import pyarrow.compute as pc

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(texts, type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    toks = pc.ascii_split_whitespace(pc.utf8_trim(texts, " "))
    lens = (
        pc.list_value_length(toks)
        .fill_null(0)
        .to_numpy(zero_copy_only=False)
        .astype(np.int64)
    )
    flat = pc.list_flatten(toks)
    wh = _token_hashes_flat(flat)
    di = np.repeat(np.arange(len(texts), dtype=np.int64), lens)
    return di, wh


def _fold_grams(di: np.ndarray, wh: np.ndarray, n: int):
    """Rotate-xor fold of ``n`` consecutive word hashes, masked at
    document boundaries — the gram half of ``_gram_stream``."""
    m = len(wh)
    if m < n:
        return np.empty(0, np.int64), np.empty(0, np.uint64)
    g = wh[: m - n + 1].copy()
    for i in range(1, n):
        g = _np_rotl(g, 13) ^ wh[i : m - n + 1 + i]
    # a fold window that crosses a document boundary is not a gram
    valid = di[: m - n + 1] == di[n - 1 :]
    return di[: m - n + 1][valid], g[valid]


def _gram_stream(texts, n: int):
    """``(doc_idx, gram_hash)`` arrays for all word n-grams of ``texts``.

    ``texts`` is a pyarrow string array (or anything ``pa.array``
    accepts).  Tokenization is BYTE-EXACT with the JVM path and the
    SQL oracle — ``split(trim(text), "\\s+")``: space-only trim, split
    on ASCII-whitespace runs keeping leading/trailing empty tokens,
    ``""`` → one empty token, NULL → no tokens — via
    ``pc.utf8_trim(x, " ")`` + ``pc.ascii_split_whitespace`` (both
    C-speed).  The gram hash is a rotate-xor fold of per-word hashes,
    the same *scheme* as the JVM path but FNV-1a instead of xxhash64 —
    the hash function is an internal detail (each path compares its own
    bench set against its own corpus grams and only counts DISTINCT
    values, so any injective-in-practice 64-bit hash gives identical
    counts).
    """
    di, wh = _word_hash_stream(texts)
    return _fold_grams(di, wh, n)


def _per_doc_counts(di: np.ndarray, g: np.ndarray, bench_sorted: np.ndarray,
                    n_docs: int):
    """Per-doc distinct-gram totals and benchmark-hit counts."""
    order = np.lexsort((g, di))
    di_s, g_s = di[order], g[order]
    first = np.ones(len(di_s), dtype=bool)
    first[1:] = (di_s[1:] != di_s[:-1]) | (g_s[1:] != g_s[:-1])
    di_u, g_u = di_s[first], g_s[first]
    if len(bench_sorted):
        idx = np.minimum(
            np.searchsorted(bench_sorted, g_u), len(bench_sorted) - 1
        )
        hits = bench_sorted[idx] == g_u
    else:
        hits = np.zeros(len(g_u), dtype=bool)
    n_grams = np.bincount(di_u, minlength=n_docs)
    n_matched = np.bincount(di_u[hits], minlength=n_docs)
    return n_grams, n_matched


def contamination_check(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
    impl: str = "auto",
    bench_collect_max: int = 100_000,
    bench_collect_max_bytes: int = 256 << 20,
) -> DataFrame:
    """Per-document contamination report against a benchmark set.

    Returns ``(doc_id, n_grams, n_matched, contaminated)`` where
    ``n_grams`` counts the document's distinct n-grams, ``n_matched``
    how many of those appear anywhere in the benchmark, and
    ``contaminated`` is ``n_matched >= min_hits``.  Documents that
    produce no grams (NULL text, fewer than ``n`` words) are absent
    from the report, on every path.

    Two physical strategies:

    * ``impl="arrow"`` — the scale path when the benchmark is small
      (it always is: eval suites are thousands of items).  The
      benchmark's distinct gram-hash set is built once on the driver
      (bounded by ``bench_collect_max`` rows AND
      ``bench_collect_max_bytes`` of text — both checked BEFORE the
      set is broadcast), shipped via ``sc.broadcast``, and the corpus
      is screened in ONE zero-shuffle ``mapInPandas`` stage: per-batch
      vectorized tokenize → FNV-1a word hashes → rotate-xor gram fold →
      lexsort distinct → searchsorted membership.  Nothing about the
      corpus is shuffled, collected, or joined — the plan is
      embarrassingly map-parallel at 100 TB.  Requires ``doc_id`` to be
      row-unique (the per-row report IS the per-doc report); the r9
      profile measured the previous join path at 976 ms on the sf0.1
      gate vs 420 ms for this path (SCALE.md §7f).
    * ``impl="join"`` — fully general fallback (duplicate ``doc_id``
      rows pool their grams; benchmark of any size).  Codegen window
      fold → broadcast-left-join on the gram hash → two doc-keyed
      hash aggregates reusing the fold's exchange; one corpus shuffle.

    ``impl="auto"`` takes the arrow path iff the benchmark fits both
    collect bounds (a count+sum(length) aggregate over the
    ``limit(max+1)`` probe decides BEFORE any text is collected — two
    tiny jobs, never a byte-unbounded driver transfer), falling back to
    the join path otherwise.
    Callers whose ``doc_id`` is NOT row-unique must pass
    ``impl="join"`` explicitly.
    """
    if impl not in ("auto", "arrow", "join"):
        raise ValueError(f"impl={impl!r}: expected auto|arrow|join")
    if isinstance(benchmark, (list, tuple)):
        # the benchmark is already driver-local (the natural shape of
        # an eval suite) — no probe job, no DataFrame detour
        if impl == "join":
            raise ValueError("impl='join' requires a DataFrame benchmark")
        return _contamination_arrow(
            docs, list(benchmark), n, doc_id, text_col, min_hits
        )
    if impl != "join":
        texts = _bounded_text_collect(
            benchmark, bench_text_col, bench_collect_max,
            bench_collect_max_bytes,
        )
        if texts is not None:
            return _contamination_arrow(
                docs, texts, n, doc_id, text_col, min_hits
            )
        if impl == "arrow":
            raise ValueError(
                f"impl='arrow' but benchmark exceeds collect bounds "
                f"(rows>{bench_collect_max} or bytes>{bench_collect_max_bytes})"
            )
    return _contamination_join(
        docs, benchmark, n, doc_id, text_col, bench_text_col, min_hits
    )


def _bounded_text_collect(benchmark, text_col, max_rows, max_bytes):
    """Texts of ``benchmark`` if it fits BOTH bounds, else ``None``.

    The bounds are checked with a cheap count+sum(length) aggregate
    over the ``limit(max_rows+1)`` probe BEFORE any text reaches the
    driver — the collect itself is never byte-unbounded (a benchmark of
    few but huge rows used to materialize fully before the byte check
    could reject it — ADVICE r9).  Deterministic: if the probe passes
    the row bound, the limit covered the whole table, so the second job
    sees the same rows."""
    probe = benchmark.select(F.col(text_col).alias("__t")).limit(
        max_rows + 1
    )
    stats = probe.agg(
        F.count(F.lit(1)).alias("__n"),
        F.sum(F.length("__t")).alias("__b"),
    ).collect()[0]
    if stats["__n"] > max_rows or (stats["__b"] or 0) > max_bytes:
        return None
    return [r["__t"] for r in probe.collect()]


def _contamination_arrow(
    docs: DataFrame,
    bench_texts: list,
    n: int,
    doc_id: str,
    text_col: str,
    min_hits: int,
) -> DataFrame:
    """Zero-shuffle screen: broadcast bench gram set + one mapInArrow."""
    import pyarrow as pa

    _, bg = _gram_stream(bench_texts, n)
    bench_sorted = np.unique(bg)
    sc = docs.sparkSession.sparkContext
    bc = sc.broadcast(bench_sorted)
    id_field = docs.schema[doc_id]
    out_schema = (
        f"`{doc_id}` {id_field.dataType.simpleString()}, n_grams int, "
        "n_matched int, contaminated boolean"
    )

    def screen(batches):
        import pyarrow as pa  # noqa: F811 — worker-side import

        bench = bc.value
        for b in batches:
            di, g = _gram_stream(b.column(1), n)
            n_grams, n_matched = _per_doc_counts(di, g, bench, b.num_rows)
            keep = np.flatnonzero(n_grams > 0)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0).take(pa.array(keep)),
                    pa.array(n_grams[keep].astype(np.int32)),
                    pa.array(n_matched[keep].astype(np.int32)),
                    pa.array(n_matched[keep] >= min_hits),
                ],
                names=[doc_id, "n_grams", "n_matched", "contaminated"],
            )

    return docs.select(doc_id, text_col).mapInArrow(screen, out_schema)


def _contamination_join(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int,
    doc_id: str,
    text_col: str,
    bench_text_col: str,
    min_hits: int,
) -> DataFrame:
    """General path: codegen gram fold + broadcast gram join.

    Plan shape: grams are 64-bit HASHES (8 bytes moved per gram, never
    gram strings), built by the codegen window fold; so the corpus-side
    pipeline is scan → posexplode → ONE doc_id exchange (window fold) →
    broadcast-left-join against the benchmark's gram hashes → two
    doc-keyed hash aggregates that both REUSE the window's
    distribution.  One corpus shuffle total, keyed by doc_id — uniform,
    skew-free.
    """
    # gram hashes come from the codegen shingle path (posexplode +
    # lead-window fold — dedup.shingled, same values as
    # word_ngram_hashes whose transform/zip_with lambdas evaluate
    # interpreted).  Its doc-keyed window exchange doubles as the
    # parallelism spreader for single-file corpora — and it is the
    # ONLY corpus exchange in the plan.
    from .dedup import shingled

    doc_grams = shingled(
        docs, doc_id, text_col, n, lower=False
    ).withColumnRenamed("sh", "__gh")
    # the benchmark side is small by contract (it is broadcast below),
    # so its grams come from the ZERO-SHUFFLE fold — the window path's
    # exchange would cost extra stages inside the broadcast-build job
    # for no parallelism gain (r9 profile: codegen-shingled bench side
    # was SLOWER, 519 vs 412 ms).
    # NO .distinct() on the bench side: duplicate bench grams only
    # multiply join rows that the (doc, gram) max-aggregate collapses
    # anyway, and the distinct's exchange+stage was ~100 ms of the
    # broadcast-build job (r9 profile, SCALE.md §7f)
    bench_grams = benchmark.select(
        F.explode(word_ngram_hashes(F.col(bench_text_col), n)).alias("__gh")
    ).withColumn("__hit", F.lit(1))
    flagged = doc_grams.join(broadcast(bench_grams), "__gh", "left")
    # per-(doc, gram) dedup then per-doc counts: BOTH groupBys are
    # satisfied by the window's hash(doc_id) distribution (doc_id is a
    # subset of the first key), so neither re-shuffles — and both are
    # whole-stage-codegen HashAggregates.
    return (
        flagged.groupBy(doc_id, "__gh")
        .agg(F.max("__hit").alias("__h"))
        .groupBy(doc_id)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_grams"),
            F.count("__h").cast("int").alias("n_matched"),
        )
        .withColumn("contaminated", F.col("n_matched") >= F.lit(min_hits))
    )


def decontaminate(
    docs: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
    impl: str = "auto",
) -> DataFrame:
    """Drop contaminated documents (the filtering counterpart).

    Anti-join on the flagged id set — the corpus body is touched once;
    at scale the flagged set is small and broadcast.
    """
    flagged = (
        contamination_check(
            docs, benchmark, n, doc_id, text_col, bench_text_col, min_hits,
            impl=impl,
        )
        .filter(F.col("contaminated"))
        .select(doc_id)
    )
    return docs.join(broadcast(flagged), doc_id, "left_anti")


# --------------------------------------------------------------------
# Bloom-prefilter decontamination (exact results, sub-linear broadcast)
# --------------------------------------------------------------------


def _bloom_build(hashes: np.ndarray, bits_per_gram: int = 12):
    """Build a Bloom filter over 64-bit gram hashes.

    Returns ``(bits, m, k)`` where ``bits`` is a uint64 word array of
    ``m`` total bits and ``k`` the number of probes.  Probes use
    Kirsch–Mitzenmacher double hashing ``pos_i = (h1 + i*h2) mod m``
    with ``h1 = h`` and ``h2 = rotl(h, 32) | 1`` (odd, so the probe
    sequence never degenerates).  ``m = bits_per_gram × n`` rounded up
    to a whole word; ``k = round(ln 2 × bits_per_gram)`` — the standard
    optimum, FP rate ≈ 0.5^k (~3e-3 at the 12-bit default).
    """
    n = max(int(len(hashes)), 1)
    m = ((bits_per_gram * n + 63) // 64) * 64
    k = max(1, round(0.6931471805599453 * bits_per_gram))
    bits = np.zeros(m // 64, dtype=np.uint64)
    h1 = hashes.astype(np.uint64)
    h2 = _np_rotl(h1, 32) | np.uint64(1)
    um = np.uint64(m)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % um
            np.bitwise_or.at(
                bits, (pos >> np.uint64(6)).astype(np.int64),
                np.uint64(1) << (pos & np.uint64(63)),
            )
    return bits, m, k


def _bloom_probe(bits: np.ndarray, m: int, k: int, g: np.ndarray) -> np.ndarray:
    """Vectorized membership test: bool array, no false negatives."""
    if len(g) == 0:
        return np.zeros(0, dtype=bool)
    h1 = g.astype(np.uint64)
    h2 = _np_rotl(h1, 32) | np.uint64(1)
    um = np.uint64(m)
    res = np.ones(len(g), dtype=bool)
    with np.errstate(over="ignore"):
        for i in range(k):
            pos = (h1 + np.uint64(i) * h2) % um
            word = bits[(pos >> np.uint64(6)).astype(np.int64)]
            res &= ((word >> (pos & np.uint64(63))) & np.uint64(1)) != 0
    return res


def bloom_from_texts(bench_texts: list, n: int, bits_per_gram: int = 12):
    """Driver-side Bloom build from benchmark texts (the common case —
    an eval suite is a driver-local artifact)."""
    _, bg = _gram_stream(bench_texts, n)
    return _bloom_build(np.unique(bg), bits_per_gram)


def bloom_from_benchmark_df(
    benchmark: DataFrame,
    n: int,
    bench_text_col: str = "text",
    bits_per_gram: int = 12,
    max_bits: int = 1 << 33,
    partial_partitions: int = 16,
):
    """Distributed Bloom build for benchmarks too large to collect.

    Two jobs: (1) an upper-bound gram-count estimate (one codegen
    aggregate of per-row word counts — grams ≤ words) sizes ``m``;
    (2) a ``mapInArrow`` pass computes each partition's PARTIAL bloom
    over its gram hashes and the ≤``partial_partitions`` partial bit
    arrays are OR-folded on the driver.  Only bit arrays ever leave the
    executors — the benchmark text itself is never collected.  ``m`` is
    capped at ``max_bits`` (1 GiB of bits by default): past the cap the
    FP rate degrades gracefully and the exact confirm pass still keeps
    results exact.
    """
    import pyarrow as pa

    est = benchmark.select(
        F.sum(
            F.size(F.split(F.trim(F.col(bench_text_col)), "\\s+"))
        ).alias("__n")
    ).collect()[0]["__n"]
    est = max(int(est or 0), 1)
    m = min(((bits_per_gram * est + 63) // 64) * 64, max_bits)
    k = max(1, round(0.6931471805599453 * bits_per_gram))

    def partial(batches):
        bits = np.zeros(m // 64, dtype=np.uint64)
        um = np.uint64(m)
        with np.errstate(over="ignore"):
            for b in batches:
                _, g = _gram_stream(b.column(0), n)
                h1 = g.astype(np.uint64)
                h2 = _np_rotl(h1, 32) | np.uint64(1)
                for i in range(k):
                    pos = (h1 + np.uint64(i) * h2) % um
                    np.bitwise_or.at(
                        bits, (pos >> np.uint64(6)).astype(np.int64),
                        np.uint64(1) << (pos & np.uint64(63)),
                    )
        yield pa.RecordBatch.from_arrays(
            [pa.array([bits.tobytes()], type=pa.binary())], names=["b"]
        )

    parts = (
        benchmark.select(F.col(bench_text_col))
        .coalesce(partial_partitions)
        .mapInArrow(partial, "b binary")
        .collect()
    )
    bits = np.zeros(m // 64, dtype=np.uint64)
    for r in parts:
        bits |= np.frombuffer(r["b"], dtype=np.uint64)
    return bits, m, k


def decontaminate_bloom(
    docs: DataFrame,
    benchmark,
    n: int = 8,
    doc_id: str = "doc_id",
    text_col: str = "text",
    bench_text_col: str = "text",
    min_hits: int = 1,
    bits_per_gram: int = 12,
    bench_collect_max: int = 1_000_000,
    bench_collect_max_bytes: int = 1 << 30,
) -> DataFrame:
    """EXACT decontamination with a Bloom-filter pre-screen.

    Identical results to ``decontaminate`` — the Bloom filter only
    narrows which documents need the exact check, never changes the
    answer:

    1. **Screen** (the 100 TB pass): broadcast the benchmark-gram Bloom
       filter (~``bits_per_gram``/8 bytes per gram — 5-6× smaller than
       the exact sorted-hash set the arrow path ships, the difference
       between a 1.5 GB and an 8 GB executor broadcast at a 10⁹-gram
       benchmark) and scan the corpus in ONE zero-shuffle ``mapInArrow``
       stage counting per-doc Bloom-positive grams.  Bloom filters have
       NO false negatives, so ``bloom_hits < min_hits`` proves a
       document clean.
    2. **Confirm** (tiny): only suspect documents — the true
       contaminated set plus an FP-rate-sized sliver (~0.3 % at the
       default 12 bits/gram) — are re-checked exactly;
       ``contamination_check`` broadcasts the exact structure over this
       small subset only.
    3. Survivors = corpus anti-join the exactly-flagged ids.

    ``benchmark`` may be a driver-local list of texts (eval suites are
    driver-sized by contract), or a DataFrame: collected when it fits
    the bounds (count+sum(length) probe BEFORE the collect — never a
    byte-unbounded driver transfer), else the Bloom filter is built
    DISTRIBUTED (``bloom_from_benchmark_df`` — partial bit-array OR,
    the benchmark never leaves the cluster) and the confirm pass uses
    the join path.

    The screen SUMS row-level bloom hits per ``doc_id`` before the
    ``min_hits`` cut, so a duplicated ``doc_id`` is never
    false-negatived at the screen.  Exact-parity caveat (inherited from
    ``decontaminate``'s auto path): when the benchmark is driver-sized
    the CONFIRM pass is ``contamination_check``'s arrow impl, whose
    per-doc report requires row-unique ``doc_id``; callers with
    duplicated ``doc_id`` rows get pooled-gram semantics only on the
    distributed-benchmark (join-confirm) path.
    """
    sc = docs.sparkSession.sparkContext
    bench_texts = None
    if isinstance(benchmark, (list, tuple)):
        bench_texts = list(benchmark)
    else:
        bench_texts = _bounded_text_collect(
            benchmark, bench_text_col, bench_collect_max,
            bench_collect_max_bytes,
        )
    if bench_texts is not None:
        bits, m, k = bloom_from_texts(bench_texts, n, bits_per_gram)
    else:
        bits, m, k = bloom_from_benchmark_df(
            benchmark, n, bench_text_col, bits_per_gram
        )
    bc = sc.broadcast(bits)
    id_field = docs.schema[doc_id]
    out_schema = (
        f"`{doc_id}` {id_field.dataType.simpleString()}, __bh int"
    )

    def screen(batches):
        import pyarrow as pa  # noqa: F811 — worker-side import

        bloom = bc.value
        for b in batches:
            di, g = _gram_stream(b.column(1), n)
            hit = _bloom_probe(bloom, m, k, g)
            # distinct (doc, gram) pairs so repeated boilerplate inside
            # one doc can't lift it past min_hits — same contract as
            # the exact paths
            order = np.lexsort((g, di))
            di_s, g_s, hit_s = di[order], g[order], hit[order]
            first = np.ones(len(di_s), dtype=bool)
            first[1:] = (di_s[1:] != di_s[:-1]) | (g_s[1:] != g_s[:-1])
            n_hits = np.bincount(
                di_s[first & hit_s], minlength=b.num_rows
            )
            keep = np.flatnonzero(n_hits > 0)
            yield pa.RecordBatch.from_arrays(
                [
                    b.column(0).take(pa.array(keep)),
                    pa.array(n_hits[keep].astype(np.int32)),
                ],
                names=[doc_id, "__bh"],
            )

    # per-doc SUM of row-level bloom hits before the min_hits cut: when
    # doc_id spans multiple rows, grams pooled across rows can reach
    # min_hits while no single row does — sum-of-row-hits is an upper
    # bound on the pooled distinct-hit count, so no false negatives
    # (ADVICE r9).  Shuffles only bloom-POSITIVE rows (the contaminated
    # set plus the FP sliver), not the corpus.
    suspects = (
        docs.select(doc_id, text_col)
        .mapInArrow(screen, out_schema)
        .groupBy(doc_id)
        .agg(F.sum("__bh").alias("__bhs"))
        .filter(F.col("__bhs") >= min_hits)
        .select(doc_id)
    )
    suspect_docs = docs.join(broadcast(suspects), doc_id, "left_semi")
    if bench_texts is not None:
        check = contamination_check(
            suspect_docs, bench_texts, n, doc_id, text_col,
            min_hits=min_hits,
        )
    else:
        check = contamination_check(
            suspect_docs, benchmark, n, doc_id, text_col, bench_text_col,
            min_hits, impl="join",
        )
    flagged = check.filter(F.col("contaminated")).select(doc_id)
    return docs.join(broadcast(flagged), doc_id, "left_anti")
