"""Deduplication operators: exact, MinHash+LSH, SimHash, n-gram Jaccard.

Scale design (100 TB / billions of docs):
 - **exact**: hash-groupBy on a 64-bit fingerprint of normalized text —
   one shuffle keyed by the fingerprint; skew-free because hashes are
   uniform.  Never ``dropDuplicates`` on the raw text column (shuffles
   full documents); shuffle the 8-byte hash, keep docs in place, and
   semi-join survivors back.
 - **MinHash+LSH**: shingle -> K minhashes -> B bands; candidate pairs
   come from a groupBy on (band_id, band_hash) — the only shuffle moves
   (doc_id, 8-byte band hash) tuples, not documents.  Bucket skew
   (boilerplate shingles) is capped by ``max_bucket`` before the
   pair-explosion, the standard guard at web scale.
 - **SimHash**: per-doc 64-bit sketch via bit-voting over token hashes;
   near-dup = small Hamming distance.  Entirely map-side except the
   final band-join.
 - **n-gram Jaccard**: exact verification — inverted-index join on
   shingle hashes, count shared shingles per pair, integer-exact
   Jaccard.  Used standalone at small scale or as the verify stage after
   LSH candidates at large scale.

Everything is built-in-function based (xxhash64, explode, groupBy) — no
Python in the hot path.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window, functions as F

from .text import doc_fingerprint

# The LSH verify stage aggregates per-doc shingle arrays that both pair
# sides join against; materializing that (tiny, candidate-restricted)
# frame saves the second corpus re-scan under it.  Module-level so the
# measurement harness can A/B the un-materialized plan.
_VERIFY_PERSIST = True


def exact_dedup_groups(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """One row per distinct normalized text: (keep_id, n_copies).

    keep_id = min id in the group; deterministic.
    """
    return (
        df.select(F.col(id_col), doc_fingerprint(F.col(text_col)).alias("fp"))
        .groupBy("fp")
        .agg(
            F.min(id_col).alias("keep_id"),
            F.count(F.lit(1)).alias("n_copies"),
        )
    )


def exact_dedup(df: DataFrame, id_col: str = "doc_id", text_col: str = "text") -> DataFrame:
    """Return the surviving rows (min-id winner per duplicate group).

    Semi-join of survivors back to the input: full rows never shuffle,
    only (id, fingerprint) pairs do.
    """
    winners = exact_dedup_groups(df, id_col, text_col).select(
        F.col("keep_id").alias(id_col)
    )
    return df.join(winners, id_col, "left_semi")


def word_shingles(text_col, n: int = 3):
    """Array of word n-gram shingle strings (lowercased, ws-normalized)."""
    words = F.split(F.regexp_replace(F.lower(F.trim(text_col)), "\\s+", " "), " ")
    k = F.size(words) - (n - 1)
    # sequence(0, -1) yields DESCENDING [0, -1] (default step -1), which
    # would feed slice(start=0) and abort the job on docs shorter than n
    idx = F.when(k > 0, F.sequence(F.lit(0), k - 1)).otherwise(
        F.array().cast("array<int>")
    )
    return F.transform(
        idx, lambda i: F.concat_ws(" ", F.slice(words, i + 1, n))
    )


def _rotl(col, k: int):
    """Rotate-left on a 64-bit long via shifts (no overflow semantics)."""
    return F.shiftleft(col, k).bitwiseOR(F.shiftrightunsigned(col, 64 - k))


def shingle_hash_array(text_col, n: int = 3):
    """Array of 64-bit word-n-gram shingle hashes.

    Hashes each word once (xxhash64) and combines n consecutive word
    hashes arithmetically (rotate-xor) via ``zip_with`` — an order of
    magnitude cheaper than materializing shingle strings (measured:
    string building dominated the whole dedup pipeline).  Collision-free
    in practice at 64 bits; all set arithmetic downstream (Jaccard,
    MinHash) is defined over these hashes.
    """
    words = F.split(F.regexp_replace(F.lower(F.trim(text_col)), "\\s+", " "), " ")
    wh = F.transform(words, lambda w: F.xxhash64(w))
    acc = wh
    for i in range(1, n):
        rest = F.slice(wh, i + 1, F.greatest(F.size(wh) - i, F.lit(0)))
        acc = F.zip_with(acc, rest, lambda a, b: _rotl(a, 13).bitwiseXOR(b))
    if n > 1:
        # zip_with pads the shorter side with nulls — drop the tail
        acc = F.filter(acc, lambda x: x.isNotNull())
    return acc


def shingled(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    group_cols: tuple = (),
    lower: bool = True,
    distinct: bool = False,
) -> DataFrame:
    """Exploded ``(group_cols..., id, sh)`` shingle-hash rows — the
    codegen shingle path.

    Produces the SAME 64-bit values as ``shingle_hash_array`` (word
    xxhash64 + identical rotate-xor fold), but computed after a
    ``posexplode`` of the word stream: the per-word hash and the fold
    over ``lead()`` windows are ordinary whole-stage-codegen
    expressions, where ``transform``/``zip_with`` lambdas evaluate
    interpreted (~0.6 µs/element × n+1 array passes — SCALE.md HOF
    findings; measured 924 → 491 ms for the n=3 corpus pass at sf0.1,
    bit-identical output).

    Cost shape: ONE doc-keyed exchange of (id, pos, word-hash) longs.
    Every current consumer follows with a doc-keyed aggregate (minhash
    signature min(), per-doc distinct, collect_list), so the window's
    exchange is the one the plan needed anyway — and it spreads work
    across reducers even when the corpus arrives in one file.  A
    pipeline that genuinely cannot afford a word-level exchange at 100
    TB keeps the zero-shuffle fold: ``explode(shingle_hash_array())``.

    ``lower=False`` matches ``contamination.word_ngram_hashes``
    tokenization (trim + ``\\s+`` split, case preserved).

    Duplicate ids are safe: each SOURCE ROW folds its own word stream.
    The window still partitions by ``(group_cols, id)`` — so the
    exchange keeps satisfying downstream doc-keyed aggregates — but
    orders by a per-source-row ``__rid`` before ``__pos`` and masks any
    fold whose ``lead`` crosses a row boundary (``lead(__rid, n-1) !=
    __rid`` ⇒ null ⇒ filtered, exactly like the partition-tail nulls).
    Rows of one ``__rid`` are contiguous under that ordering, so the
    single ``n-1`` check covers every intermediate lead.
    """
    gcols = list(group_cols)
    if lower:
        words = F.split(
            F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " "), " "
        )
    else:
        words = F.split(F.trim(F.col(text_col)), "\\s+")
    ex = df.withColumn("__rid", F.monotonically_increasing_id()).select(
        *gcols, F.col(id_col), "__rid", F.posexplode(words).alias("__pos", "__w")
    ).select(*gcols, id_col, "__rid", "__pos", F.xxhash64("__w").alias("__wh"))
    acc = F.col("__wh")
    if n > 1:
        win = Window.partitionBy(*gcols, id_col).orderBy("__rid", "__pos")
        for i in range(1, n):
            acc = _rotl(acc, 13).bitwiseXOR(F.lead("__wh", i).over(win))
        acc = F.when(
            F.lead("__rid", n - 1).over(win) == F.col("__rid"), acc
        )
    out = ex.select(*gcols, id_col, acc.alias("sh"))
    if n > 1:
        out = out.filter(F.col("sh").isNotNull())
    return out.distinct() if distinct else out


def shingle_table(
    df: DataFrame, id_col: str = "doc_id", text_col: str = "text", n: int = 3,
    partitions: int | None = None,
) -> DataFrame:
    """(id, shingle_hash) distinct — the inverted-index building block.
    Hash shingles to 64-bit before shuffling (8 bytes vs full strings).

    The result is hash-partitioned by ``sh`` so a downstream self-join
    is co-partitioned AND both join sides reuse one exchange
    (ReuseExchange fires on the identical repartition subtree) —
    documents often arrive in a handful of files, and without this the
    quadratic pair generation runs at file parallelism.
    """
    exploded = shingled(df, id_col, text_col, n, distinct=True)
    if partitions:
        # distinct FIRST, then repartition by sh: the repartition
        # exchange is the subtree both self-join sides reuse, so the
        # dedup aggregation runs once.  (Deduping inside the
        # sh-partitioning saves an exchange on paper but re-runs the
        # final dedup agg + sort per join side — measured slower.)
        return exploded.repartition(partitions, "sh")
    return exploded


def ngram_jaccard_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
    max_shingle_df: int | None = None,
    impl: str = "auto",
    dense_max_vocab: int = 8192,
    max_block: int = 1024,
    packed_ids: bool = True,
    cache_index: bool = False,
) -> DataFrame:
    """Exact Jaccard-similar pairs.

    Returns (id_a, id_b, n_a, n_b, shared, jaccard) with id_a < id_b and
    jaccard >= threshold.  The threshold test is integer-exact
    (``shared >= t * (n_a + n_b - shared)`` cross-multiplied), so an SQL
    oracle reproduces it bit-for-bit.

    Two physical strategies, identical results:

    * ``impl='index'`` — inverted-index self-join on shingle hashes.
      The scale default for real text: cost is sum(df(sh)^2) over
      shingles, linear in corpus size when the shingle vocabulary grows
      with the corpus (docs per shingle stays bounded).  Measured
      caveat (SCALE.md §7q): once the index outgrows the broadcast
      threshold the join becomes sort-merge partitioned BY SHINGLE,
      the pair-count partial-combine loses doc locality, and the
      exchange carries the raw sum(df^2) candidate tuples — at low
      thresholds over boilerplate-bearing corpora set
      ``max_shingle_df`` (measured to restore linear scaling) or use
      ``minhash_lsh_pairs`` (measured linear).
    * ``impl='dense'`` — blocked bitmap GEMM.  When the shingle
      VOCABULARY is small (bounded label/token sets, templated text),
      every shingle appears in a large fraction of docs and the
      inverted index degenerates to near-all-pairs row explosion
      (measured at sf0.1: 931 distinct bigrams -> 73M intersect tuples
      for 12.5M doc pairs).  Dense path: per-doc distinct shingle-hash
      arrays (``array_distinct``, zero shuffle), sub-split into
      ``max_block`` blocks exactly like
      ``similarity.neardup_pairs_blocked`` (every unordered pair of
      docs lands in exactly one group), and one numpy GEMM per group
      over a group-LOCAL vocabulary computes all intersection counts
      at once.  0/1 float32 products with <2^24-wide sums are exact
      integers, and the final round/divide stays JVM-side, so results
      are bit-identical to the index path.
    * ``impl='auto'`` — one cheap ``approx_count_distinct`` probe over
      the shingle stream picks dense only when the vocabulary provably
      fits (< 0.9 * ``dense_max_vocab``).

    ``max_shingle_df`` drops shingles appearing in more than that many
    docs before the join — the stop-shingle guard that keeps the
    self-join from exploding on boilerplate at scale (index path only).
    """
    if impl == "auto":
        # bounded probe: a fixed-size document sample, not the corpus —
        # at 100 TB a full approx_count_distinct scan per call would
        # dwarf the work it routes.  Sample vocabulary only ever
        # UNDER-counts, so add the safety margin on the sample side:
        # route dense only when the sample's vocab is well under the
        # cap; a large-vocab corpus shows a large vocab in any 50k-doc
        # sample long before the cap matters.
        probe = (
            shingled(df.limit(50_000), id_col, text_col, n)
            .agg(F.approx_count_distinct("sh", 0.02).alias("v"))
            .collect()[0]["v"]
        )
        impl = "dense" if probe < dense_max_vocab * 0.9 else "index"
    if impl == "dense" and max_shingle_df is None:
        return _jaccard_pairs_dense(
            df, id_col, text_col, n, threshold, max_block
        )
    nparts = df.sparkSession.sparkContext.defaultParallelism * 2
    sh = shingle_table(df, id_col, text_col, n, partitions=nparts)
    if max_shingle_df is not None:
        rare = (
            sh.groupBy("sh").agg(F.count(F.lit(1)).alias("df_"))
            .filter(F.col("df_") <= max_shingle_df)
            .select("sh")
        )
        sh = sh.join(rare, "sh", "left_semi")
        if cache_index:
            # materialize the guarded (id, sh) table — 16 bytes/row,
            # the natural lineage cut before the quadratic self-join.
            # Without it the df-guard semi-join (and its sorts) re-runs
            # in all three consumers (join side a, side b, sizes) above
            # the reused sh exchange: measured 1.29 -> 1.03 s on the
            # standalone sf0.1 gate, hash-identical.  OPT-IN because a
            # caller whose input is already a cached checkpoint (the
            # crawl pipeline persists post-extraction text) measured
            # WORSE with a second materialization serializing the job
            # (2.6-3.1 -> 3.8-4.9 s paired draws) — double-caching a
            # composed pipeline buys nothing and costs a sync point.
            # InMemoryTableScan preserves the hash(sh) partitioning,
            # so the self-join stays co-partitioned either way.
            # cached_leaf additionally truncates the ANALYZED lineage
            # at the cache point (the three consumers otherwise embed
            # and re-analyze the tokenize+guard subtree each).
            from .parallel import cached_leaf

            sh = cached_leaf(sh.persist())
    sizes = sh.groupBy(id_col).agg(F.count(F.lit(1)).alias("n_sh"))

    # inverted-index self-join: AQE's skew-join splitting spreads hot
    # shingles across tasks (a collect_list/explode formulation funnels
    # each hot shingle's d^2 pairs into ONE task — measurably worse).
    # With packed_ids (default) the pair is packed into a single long
    # so the count aggregation hashes one word instead of two columns —
    # valid only for ids in [0, 2^32).  That bound is ENFORCED in the
    # plan: an assert_true filter on the shingle stream (two codegen
    # comparisons per row) fails the job loudly instead of silently
    # corrupting pairs.  Corpora with wider/negative ids (billion-doc
    # crawls with 64-bit fingerprint ids) pass packed_ids=False: the
    # aggregate keys on the two id columns directly.
    if packed_ids:
        in_range = (F.col(id_col) >= 0) & (F.col(id_col) < F.lit(1 << 32))
        guarded = sh.where(
            F.assert_true(
                in_range,
                f"ngram_jaccard_pairs(packed_ids=True) requires 0 <= "
                f"{id_col} < 2^32; use packed_ids=False for wider ids",
            ).isNull()
        )
        a = guarded.alias("a")
        b = guarded.alias("b")
        pair = F.shiftleft(F.col(f"a.{id_col}"), 32).bitwiseOR(
            F.col(f"b.{id_col}")
        )
        shared = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(pair.alias("pair"))
            .groupBy("pair")
            .agg(F.count(F.lit(1)).alias("shared"))
            .select(
                F.shiftrightunsigned("pair", 32).alias("id_a"),
                F.col("pair").bitwiseAND(F.lit((1 << 32) - 1)).alias("id_b"),
                "shared",
            )
        )
    else:
        a = sh.alias("a")
        b = sh.alias("b")
        shared = (
            a.join(b, (F.col("a.sh") == F.col("b.sh")) & (F.col(f"a.{id_col}") < F.col(f"b.{id_col}")))
            .select(
                F.col(f"a.{id_col}").alias("id_a"),
                F.col(f"b.{id_col}").alias("id_b"),
            )
            .groupBy("id_a", "id_b")
            .agg(F.count(F.lit(1)).alias("shared"))
        )
    return _jaccard_from_shared(shared, sizes, id_col, threshold)


def _jaccard_pairs_dense(
    df: DataFrame,
    id_col: str,
    text_col: str,
    n: int,
    threshold: float,
    max_block: int,
) -> DataFrame:
    """Blocked bitmap-GEMM all-pairs Jaccard (small-vocabulary path).

    Docs hash into ``m = ceil(n_docs / max_block)`` sub-blocks; every
    unordered sub-block pair is one ``applyInPandas`` group, so no task
    holds more than ~2 * max_block docs and total GEMM work is
    independent of ``m`` (sum over groups of |A||B|·vocab = n²·vocab/2).
    """
    import numpy as np
    import pandas as pd

    docs = df.select(
        F.col(id_col),
        F.array_distinct(shingle_hash_array(F.col(text_col), n)).alias("shs"),
    ).filter(F.size("shs") > 0)
    total = docs.agg(F.count(F.lit(1)).alias("__n"))
    tagged = (
        docs.crossJoin(F.broadcast(total))
        .withColumn(
            "__m",
            F.greatest(F.lit(1), F.ceil(F.col("__n") / F.lit(max_block))).cast(
                "int"
            ),
        )
        .withColumn(
            "__sub", F.pmod(F.xxhash64(F.col(id_col)), F.col("__m")).cast("int")
        )
    )
    groups = F.array_distinct(
        F.transform(
            F.sequence(F.lit(0), F.col("__m") - 1),
            lambda t: F.struct(
                F.least(F.col("__sub"), t).alias("sa"),
                F.greatest(F.col("__sub"), t).alias("sb"),
            ),
        )
    )
    exploded = tagged.select(
        F.col(id_col), "shs", "__sub", F.explode(groups).alias("__g")
    ).select(
        id_col, "shs", "__sub",
        F.col("__g.sa").alias("__sa"), F.col("__g.sb").alias("__sb"),
    )

    empty = pd.DataFrame(
        {c: [] for c in ("id_a", "id_b", "n_a", "n_b", "shared")}
    )

    def _mat(part, vocab):
        """0/1 float32 membership matrix over the group-local vocab."""
        arrs = [np.asarray(a, dtype=np.int64) for a in part["shs"]]
        lens = np.array([len(a) for a in arrs], dtype=np.int64)
        flat = np.concatenate(arrs) if arrs else np.empty(0, np.int64)
        cols = np.searchsorted(vocab, flat)
        M = np.zeros((len(arrs), len(vocab)), dtype=np.float32)
        M[np.repeat(np.arange(len(arrs)), lens), cols] = 1.0
        return M, lens

    def group_pairs(key, pdf):
        sa, sb = int(key[0]), int(key[1])
        vocab = np.unique(
            np.concatenate([np.asarray(a, dtype=np.int64) for a in pdf["shs"]])
        )
        if sa == sb:
            part = pdf.sort_values(id_col)
            if len(part) < 2:
                return empty
            ids = part[id_col].to_numpy(dtype=np.int64)
            M, lens = _mat(part, vocab)
            S = M @ M.T
            iu, ju = np.triu_indices(len(ids), k=1)
            shared = S[iu, ju].astype(np.int64)
            na, nb = lens[iu], lens[ju]
            keep = shared.astype(np.float64) >= threshold * (
                (na + nb - shared).astype(np.float64)
            )
            return pd.DataFrame(
                {
                    "id_a": ids[iu[keep]],
                    "id_b": ids[ju[keep]],
                    "n_a": na[keep],
                    "n_b": nb[keep],
                    "shared": shared[keep],
                }
            )
        A = pdf[pdf["__sub"] == sa]
        B = pdf[pdf["__sub"] == sb]
        if A.empty or B.empty:
            return empty
        MA, lens_a = _mat(A, vocab)
        MB, lens_b = _mat(B, vocab)
        ids_a = A[id_col].to_numpy(dtype=np.int64)
        ids_b = B[id_col].to_numpy(dtype=np.int64)
        S = MA @ MB.T
        shared = S.astype(np.int64)
        na = lens_a[:, None]
        nb = lens_b[None, :]
        keep = shared.astype(np.float64) >= threshold * (
            (na + nb - shared).astype(np.float64)
        )
        ii, jj = np.nonzero(keep)
        ia, ib = ids_a[ii], ids_b[jj]
        return pd.DataFrame(
            {
                "id_a": np.minimum(ia, ib),
                "id_b": np.maximum(ia, ib),
                "n_a": np.where(ia < ib, lens_a[ii], lens_b[jj]),
                "n_b": np.where(ia < ib, lens_b[jj], lens_a[ii]),
                "shared": shared[ii, jj],
            }
        )

    pairs = exploded.groupBy("__sa", "__sb").applyInPandas(
        group_pairs,
        schema="id_a long, id_b long, n_a long, n_b long, shared long",
    )
    union_ = F.col("n_a") + F.col("n_b") - F.col("shared")
    return pairs.select(
        "id_a", "id_b", "n_a", "n_b", "shared",
        F.round(F.col("shared") / union_, 4).alias("jaccard"),
    )


def _jaccard_from_shared(shared: DataFrame, sizes: DataFrame, id_col: str,
                         threshold: float) -> DataFrame:
    sa = sizes.select(F.col(id_col).alias("id_a"), F.col("n_sh").alias("n_a"))
    sb = sizes.select(F.col(id_col).alias("id_b"), F.col("n_sh").alias("n_b"))
    return (
        shared.join(F.broadcast(sa), "id_a").join(F.broadcast(sb), "id_b")
        .withColumn("union_", F.col("n_a") + F.col("n_b") - F.col("shared"))
        # threshold test on integers x an exact double product — both
        # engines evaluate `shared >= t * union` identically in IEEE754
        .filter(F.col("shared") >= F.lit(threshold) * F.col("union_"))
        .select(
            "id_a", "id_b", "n_a", "n_b", "shared",
            F.round(F.col("shared") / F.col("union_"), 4).alias("jaccard"),
        )
    )


def verify_jaccard_pairs(
    df: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    threshold: float = 0.5,
) -> DataFrame:
    """Exact Jaccard, restricted to candidate (id_a, id_b) pairs — the
    verify stage after LSH.  Cost O(|candidates| * shingles_per_doc)
    instead of all-pairs."""
    return verify_jaccard_pairs_from_shingles(
        shingle_table(df, id_col, text_col, n), candidates, id_col, threshold
    )


def verify_jaccard_pairs_from_shingles(
    sh: DataFrame,
    candidates: DataFrame,
    id_col: str = "doc_id",
    threshold: float = 0.5,
    sizes: DataFrame | None = None,
) -> DataFrame:
    """Verify stage over a prebuilt (id, shingle-hash) table.

    Per-doc shingle SETS are aggregated into arrays (one shuffle over
    the — typically candidate-restricted — shingle table), each
    candidate pair picks up both arrays via two equi-joins, and the
    intersection count is a single JVM ``array_intersect`` per pair (a
    hash-set probe, O(n_a + n_b)).  Compared to the previous
    explode-join-count formulation this removes two wide shuffles (the
    pair×shingle expansion and its re-aggregation) and the id < 2^32
    pair-packing constraint; when the caller localizes ``candidates``
    both joins broadcast and the whole verify is one shuffle total.
    ``sizes`` is accepted for API compatibility but ignored — set sizes
    fall out of the arrays for free.
    """
    arrs = sh.groupBy(id_col).agg(F.collect_list("sh").alias("__shs"))
    if _VERIFY_PERSIST:
        # arrs is referenced for BOTH pair sides below; without a
        # materialization the whole subtree UNDER it — including the
        # candidate-restricted corpus re-scan feeding ``sh`` — executes
        # once per side.  At crawl scale that is an extra full corpus
        # read in the verify stage; arrs itself is tiny (candidate docs
        # only, one array of longs each), the cheapest possible cut
        # point.  cached_leaf additionally stops the twin joins from
        # re-analyzing the subtree per reference.
        from .parallel import cached_leaf

        arrs = cached_leaf(arrs.persist())
    a = arrs.select(F.col(id_col).alias("id_a"), F.col("__shs").alias("__sa"))
    b = arrs.select(F.col(id_col).alias("id_b"), F.col("__shs").alias("__sb"))
    return (
        candidates.select("id_a", "id_b")
        .join(a, "id_a")
        .join(b, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size("__sa").alias("n_a"),
            F.size("__sb").alias("n_b"),
            F.size(F.array_intersect("__sa", "__sb")).alias("shared"),
        )
        .withColumn("union_", F.col("n_a") + F.col("n_b") - F.col("shared"))
        # cross-multiplied threshold: both engines evaluate
        # `shared >= t * union` identically in IEEE754
        .filter(F.col("shared") >= F.lit(threshold) * F.col("union_"))
        .select(
            "id_a", "id_b", "n_a", "n_b", "shared",
            F.round(F.col("shared") / F.col("union_"), 4).alias("jaccard"),
        )
    )


# ---------------------------------------------------------------- MinHash/LSH

# Mersenne prime 2^31-1: a*x stays < 2^62, inside long range even with
# ANSI overflow checks on (Spark 4 default)
MERSENNE = (1 << 31) - 1


def minhash_signatures(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    seed: int = 42,
) -> DataFrame:
    """(id, sig: array<bigint>) — K permutation minhashes per doc.

    h_i(x) = (a_i * x + b_i) mod p over the shingle's xxhash64.  min()
    ignores duplicates, so the shingles are exploded WITHOUT the
    distinct pass — one shuffle total, and hash-agg partial aggregation
    reduces each map task's output to one K-vector per doc before it.
    (A per-row array-expression formulation avoids the shuffle entirely
    but re-evaluates the shingle array per hash function — measured far
    slower; the single groupBy wins.)
    """
    import random

    rnd = random.Random(seed)
    params = [(rnd.randrange(1, MERSENNE), rnd.randrange(0, MERSENNE)) for _ in range(num_hashes)]
    tok = shingled(df, id_col, text_col, n).select(
        id_col, F.pmod(F.col("sh"), F.lit(MERSENNE)).alias("x")
    )
    return _minhash_agg(tok, id_col, params)


def minhash_signatures_from_shingles(
    sh: DataFrame,
    id_col: str = "doc_id",
    num_hashes: int = 32,
    seed: int = 42,
    with_sizes: bool = False,
) -> DataFrame:
    """Signatures over a prebuilt (id, sh) shingle table — identical
    result to ``minhash_signatures`` (min() is insensitive to the
    distinct pass the shingle table applies).  ``with_sizes`` adds an
    ``n_sh`` per-doc shingle count column — free inside the same
    aggregation, and exactly what the Jaccard verify stage needs."""
    import random

    rnd = random.Random(seed)
    params = [(rnd.randrange(1, MERSENNE), rnd.randrange(0, MERSENNE)) for _ in range(num_hashes)]
    tok = sh.select(id_col, F.pmod(F.col("sh"), F.lit(MERSENNE)).alias("x"))
    return _minhash_agg(tok, id_col, params, with_sizes)


def _minhash_params(num_hashes: int, seed: int) -> list[tuple[int, int]]:
    import random

    rnd = random.Random(seed)
    return [
        (rnd.randrange(1, MERSENNE), rnd.randrange(0, MERSENNE))
        for _ in range(num_hashes)
    ]


def _minhash_agg(
    tok: DataFrame, id_col: str, params: list[tuple[int, int]],
    with_sizes: bool = False, group_cols: list[str] | None = None,
) -> DataFrame:
    # One spark.sql() parse instead of K Column trees: building
    # min(pmod(a*x+b, M)) per hash function through the Python Column
    # API costs ~6 Py4J round trips per hash — ~400 driver round trips
    # for K=64, a measured 0.28 s of the minhash gates' per-sample
    # build.  The SQL string parses JVM-side in one round trip and
    # yields the IDENTICAL analyzed expressions (int literals promote
    # the same way; pmod/min are the same functions).
    group_cols = group_cols or [id_col]
    grp = ", ".join(f"`{c}`" for c in group_cols)
    mins = ", ".join(
        f"min(pmod({a} * x + {b}, {MERSENNE})) AS h{i}"
        for i, (a, b) in enumerate(params)
    )
    if with_sizes:
        mins += ", count(1) AS n_sh"
    arr = ", ".join(f"h{i}" for i in range(len(params)))
    extra = ", n_sh" if with_sizes else ""
    return tok.sparkSession.sql(
        f"SELECT {grp}, array({arr}) AS sig{extra} FROM "
        f"(SELECT {grp}, {mins} FROM {{tok}} GROUP BY {grp})",
        tok=tok,
    )


def _band_hashes(sig: DataFrame, id_col: str, out_id: str,
                 num_hashes: int, bands: int) -> DataFrame:
    """(out_id, band, bh): one 64-bit hash per signature band.

    Each band hashes its signature slice with ONE native ``xxhash64``
    call (xxhash64 hashes array<bigint> recursively, and the band index
    rides in as a second argument so identical member-tuples in
    different bands land in different buckets).  The previous rotate-xor
    fold spelled the combine as nested shift/or/xor Column arithmetic —
    but ``_rotl(acc, k)`` references ``acc`` twice, so the expression
    TREE doubled per fold level (2^rows_per_band nodes), and with the
    fold duplicated across ``bands`` structs inside one explode the
    generated Java overflowed janino's 64 KB/constant-pool limits and
    the whole Generate stage silently fell back to interpreted
    evaluation.  Band hashes are internal bucketing keys only (the
    exact-Jaccard verify filters false candidates), so the hash
    function is free to change.
    """
    rows_per_band = num_hashes // bands
    # single spark.sql() parse for the same reason as _minhash_agg:
    # `bands` struct(lit, xxhash64(slice(...)))` trees through the
    # Column API are ~50 Py4J round trips of pure driver latency
    elems = ", ".join(
        f"named_struct('band', {i}, 'bh', "
        f"xxhash64(slice(sig, {i * rows_per_band + 1}, {rows_per_band}),"
        f" {i}))"
        for i in range(bands)
    )
    return sig.sparkSession.sql(
        f"SELECT `{out_id}`, b.band AS band, b.bh AS bh FROM "
        f"(SELECT `{id_col}` AS `{out_id}`, explode(array({elems})) AS b "
        f"FROM {{sig}})",
        sig=sig,
    )


def _cut_lineage_pairs(
    candidates: DataFrame, max_driver_rows: int = 1_000_000,
    dedup: bool = False,
) -> tuple[DataFrame, bool]:
    """Materialize an (id_a, id_b) candidate list and CUT its lineage.

    Small sets (the common LSH case: candidates ≪ corpus) round-trip to
    the driver via Arrow — two int64 columns, ~16 B/pair, 16 MB at the
    1M default — and come back as a localized DataFrame that holds NO
    executor state and no lineage back through the banding pipeline, so
    downstream joins broadcast it and repeated actions on the result
    never re-run the signature stages.  Sets above the threshold stay
    persisted (MEMORY_AND_DISK); the caller's result keeps that cache
    alive and a long-lived session may `unpersist()` it when done.

    Returns ``(pairs, localized)`` — ``localized`` tells the caller the
    set is driver-sized (safe to force-broadcast in joins).

    ``dedup=True`` lets the caller hand in the RAW (possibly duplicated
    — e.g. one hit per LSH band) pair stream: small sets dedup on the
    driver (``drop_duplicates`` on two int64 columns), skipping the
    ``distinct()`` shuffle entirely; only the spill path pays it.
    """
    from pyspark import StorageLevel

    spark = candidates.sparkSession
    # limit(N+1) probe WITHOUT an upfront persist (r15): the common
    # case is candidates ≪ limit, where the old
    # persist→probe→unpersist sequence serialized every partition
    # into the memory store just to throw it away — measured 0.4 s of
    # the minhash gate's steady state.  Optimistic probe first; only
    # the spill path (set exceeds the driver cap) pays a persist plus
    # ONE pipeline recompute (the probe's partial run is lost — at
    # that size the extra waves are noise against the distinct()).
    tbl = candidates.limit(max_driver_rows + 1).toArrow()
    if tbl.num_rows <= max_driver_rows:
        if dedup:
            tbl = tbl.group_by(tbl.column_names).aggregate([])
        return (
            spark.createDataFrame(tbl, schema=candidates.schema),
            True,
        )
    c = candidates.persist(StorageLevel.MEMORY_AND_DISK)
    if dedup:
        d = c.distinct().persist(StorageLevel.MEMORY_AND_DISK)
        d.count()
        c.unpersist()
        return d, False
    c.count()
    return c, False


def minhash_lsh_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    seed: int = 42,
    max_driver_pairs: int = 1_000_000,
) -> DataFrame:
    """Near-dup pairs: LSH banding for candidates, exact Jaccard verify.

    Pipeline: signatures in ONE shuffle straight off the corpus (min()
    is duplicate-insensitive, so no distinct pass and no materialized
    shingle table) -> explode signatures into ``bands`` band-hashes ->
    groupBy (band, hash) buckets (bucket size capped at ``max_bucket``
    to bound skew) -> distinct candidate pairs, materialized ONCE with
    lineage cut (Arrow driver round-trip under ``max_driver_pairs``,
    else a persist) -> verify: re-shingle ONLY the candidate documents
    (a broadcast semi-join of the corpus against candidate ids) and
    compute the exact restricted Jaccard, keep >= threshold.

    Scale shape: shuffle volume is K longs/doc for signatures plus
    ``bands`` longs/doc for banding; the verify stage touches only the
    candidate fraction of the corpus (one extra column-pruned scan +
    broadcast semi-join), and NOTHING corpus-sized is ever cached in
    executor storage — the previous design pinned the full (id,
    shingle-hash) table (~16 B x shingles/doc x corpus) in cluster
    memory for the pipeline's lifetime, which at crawl scale is
    terabytes of storage memory for one operator.
    """
    sig = minhash_signatures(df, id_col, text_col, n, num_hashes, seed)
    banded = _band_hashes(sig, id_col, id_col, num_hashes, bands)
    buckets = (
        banded.groupBy("band", "bh")
        .agg(F.collect_list(id_col).alias("ids"))
        .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
    )
    sorted_ids = F.array_sort("ids")
    pair_structs = F.flatten(
        F.transform(
            sorted_ids,
            lambda x, i: F.transform(
                F.slice(sorted_ids, i + 2, F.size(sorted_ids)),
                lambda y: F.struct(x.alias("id_a"), y.alias("id_b")),
            ),
        )
    )
    candidates, localized = _cut_lineage_pairs(
        buckets.select(F.explode(pair_structs).alias("p"))
        .select("p.id_a", "p.id_b"),
        max_driver_pairs,
        dedup=True,
    )
    # verify over the candidate docs only: the semi-join broadcasts the
    # (localized) candidate ids, so the corpus re-scan is column-pruned
    # and shuffle-free; shingle_table's distinct then runs on the small
    # candidate subset
    cand_ids = (
        candidates.select(F.col("id_a").alias(id_col))
        .unionByName(candidates.select(F.col("id_b").alias(id_col)))
        .distinct()
    )
    if localized:
        cand_ids = F.broadcast(cand_ids)
    sub = df.join(cand_ids, id_col, "left_semi")
    sh = shingle_table(sub, id_col, text_col, n)
    return verify_jaccard_pairs_from_shingles(sh, candidates, id_col, threshold)


# ------------------------------------------------------------------- SimHash


def simhash(df: DataFrame, id_col: str = "doc_id", text_col: str = "text",
            bits: int = 64, hash_fn=None) -> DataFrame:
    """(id, simhash: bigint) — bit-voting over token hash values.

    Explode tokens once, then ONE hash aggregation computes all 64 bit
    votes as partial-aggregated sums (map-side combine), so the shuffle
    carries 64 longs per doc regardless of document length.  ~50x faster
    than evaluating 64 array-aggregate lambdas per row.

    ``hash_fn`` maps a token Column to a 64-bit long Column; default is
    Spark's ``xxhash64`` (the production path).  The correctness gate
    passes an md5-derived hash an external SQL oracle can replay —
    same trick as ``exact_dup_groups``.
    """
    if hash_fn is None:
        hash_fn = F.xxhash64
    tok = df.select(
        F.col(id_col),
        F.explode(
            F.split(F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " "), " ")
        ).alias("w"),
    ).select(id_col, hash_fn(F.col("w")).alias("h"))

    # Packed-lane vote counting: accumulator p_j sums bits j and j+32 of
    # every token hash in two independent 32-bit lanes of one long (no
    # cross-lane carry below 2^32 tokens/doc), so the aggregation is 32
    # columns wide instead of 64.  vote_i > 0  <=>  2*count_set_i > n,
    # identical to the previous sum(+/-1) formulation.  The width matters
    # for wall-clock: at bench scale the 64-agg plan spent more time in
    # Catalyst analysis (eager, re-run per transform, duplicated across
    # the old self-join) than in execution.
    # One spark.sql() parse for the whole vote pipeline (same rationale
    # as _minhash_agg): the 32 lane-sum aggregates built through the
    # Column API cost ~5 Py4J round trips each — ~160 driver round
    # trips of per-sample build latency.  The SQL string parses
    # JVM-side in one call and analyzes to the identical plan.
    lane_mask = (1 << 32) | 1
    sums = ", ".join(
        f"sum(shiftrightunsigned(h, {j}) & {lane_mask}) AS p{j}"
        for j in range(32)
    )
    terms = []
    for i in range(bits):
        j, lane = i % 32, i // 32
        cnt = f"((p{j} >> 32) & 4294967295)" if lane else f"(p{j} & 4294967295)"
        m = f"{1 << i}L" if i < 63 else "(-9223372036854775807L - 1L)"
        terms.append(f"(CASE WHEN 2 * {cnt} > n THEN {m} ELSE 0L END)")
    fp = " | ".join(terms)
    return tok.sparkSession.sql(
        f"SELECT `{id_col}`, CAST(({fp}) AS BIGINT) AS simhash FROM "
        f"(SELECT `{id_col}`, count(1) AS n, {sums} FROM {{tok}} "
        f"GROUP BY `{id_col}`)",
        tok=tok,
    )


def simhash_pairs(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_hamming: int = 3,
    band_bits: int | None = None,
    hash_fn=None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Near-dup pairs by SimHash Hamming distance <= max_hamming.

    Banding turns the quadratic scan into an equi-join — the standard
    trick for SimHash at crawl scale.  The band count is DERIVED from
    ``max_hamming`` (pigeonhole: h differing bits can break at most h
    bands, so ``bands >= h + 1`` guarantees one identical band — 100 %
    recall).  Passing an explicit ``band_bits`` that yields fewer bands
    than the recall contract needs raises instead of silently missing
    pairs.  ``max_bucket`` bounds a degenerate hot band (same guard as
    ``minhash_lsh_pairs``): a band value shared by B docs is dropped
    when B > max_bucket instead of generating B^2 candidates.
    """
    return simhash_pairs_from_sketches(
        simhash(df, id_col, text_col, hash_fn=hash_fn),
        id_col, max_hamming, band_bits, max_bucket,
    )


def simhash_pairs_from_sketches(
    sh: DataFrame,
    id_col: str = "doc_id",
    max_hamming: int = 3,
    band_bits: int | None = None,
    max_bucket: int = 1000,
) -> DataFrame:
    """Banding + Hamming filter over precomputed (id, simhash) sketches.

    See ``simhash_pairs``; split out so recall can be tested on planted
    bit-perturbed sketches directly.
    """
    if band_bits is not None:
        nbands = 64 // band_bits
        if nbands < max_hamming + 1:
            raise ValueError(
                f"band_bits={band_bits} gives {nbands} bands; the recall "
                f"contract for max_hamming={max_hamming} needs >= "
                f"{max_hamming + 1} bands"
            )
    else:
        nbands = min(64, max_hamming + 1)
    # split 64 bits into nbands contiguous chunks (widths differ by <= 1)
    base, rem = divmod(64, nbands)
    widths = [base + 1 if i < rem else base for i in range(nbands)]
    offsets = [sum(widths[:i]) for i in range(nbands)]

    def band_value(i: int):
        if widths[i] == 64:
            return F.col("simhash")
        return F.shiftrightunsigned("simhash", offsets[i]).bitwiseAND(
            F.lit((1 << widths[i]) - 1)
        )

    # NULL sketches and NULL ids can never form a usable pair (the old
    # in-array path dropped null sketches at its bit_count filter and
    # emitted null-id pairs no caller can join back); drop both BEFORE
    # banding so the Arrow path's parallel (ids, shs) collect_lists
    # stay aligned — collect_list drops nulls PER COLUMN, so a null in
    # either column would silently shift every later (id, sketch)
    # pairing in that bucket.
    sh = sh.filter(
        F.col("simhash").isNotNull() & F.col(id_col).isNotNull()
    )
    # Bucket formulation instead of a self-join: one shuffle groups the
    # banded sketches, bucket size is capped (skew guard — a degenerate
    # band value shared by B docs would otherwise emit B^2 candidates),
    # and the sketch subtree appears ONCE in the plan (the a/b self-join
    # duplicated it, doubling Catalyst analysis time).
    banded = sh.select(
        id_col,
        "simhash",
        F.explode(
            F.array(
                *[
                    F.struct(F.lit(i).alias("band"), band_value(i).alias("bh"))
                    for i in range(nbands)
                ]
            )
        ).alias("b"),
    ).select(id_col, "simhash", F.col("b.band").alias("band"), F.col("b.bh").alias("bh"))
    # Pair expansion + Hamming pre-filter run BEFORE the explode and
    # the dedup shuffle: hot bands legitimately under max_bucket still
    # emit O(B^2) candidates (measured 415k candidates -> 1.7k
    # survivors at bench scale), and shuffling the rejects through
    # distinct() tripled the stage's wall-clock.  For integer ids the
    # expansion is an Arrow pass — numpy triu indices + a byte-LUT
    # popcount over the XORed sketches; the equivalent in-array
    # nested-``F.transform`` spelling builds every pair struct through
    # the interpreted lambda evaluator (~2-3 µs/pair vs ~20 ns
    # vectorized).  The 100× cheaper expansion also retires the
    # ``repartition(defaultParallelism)`` guard stage the interpreted
    # path needed against AQE coalescing the byte-small/work-heavy
    # bucket stage onto one task — one fewer shuffle; a max_bucket
    # bucket (1000 members ⇒ 500k pairs) costs ~10 ms in numpy, so
    # amplification stays invisible until bucket caps far beyond the
    # skew guard.  Non-integer id types keep the expression path (with
    # its guard stage).
    from pyspark.sql.types import IntegerType, LongType

    id_type = next(
        f.dataType for f in banded.schema.fields if f.name == id_col
    )
    if isinstance(id_type, (IntegerType, LongType)):
        import numpy as np

        buckets = (
            banded.groupBy("band", "bh")
            .agg(
                F.collect_list(id_col).alias("ids"),
                F.collect_list("simhash").alias("shs"),
            )
            .filter((F.size("ids") > 1) & (F.size("ids") <= max_bucket))
        )
        pop = np.unpackbits(
            np.arange(256, dtype=np.uint8)[:, None], axis=1
        ).sum(axis=1).astype(np.int64)
        mh = int(max_hamming)

        def expand(batches):
            import pandas as pd

            for pdf in batches:
                ia, ib, sa, sb = [], [], [], []
                for ids_l, shs_l in zip(pdf["ids"], pdf["shs"]):
                    ids = np.asarray(ids_l, dtype=np.int64)
                    shs = np.asarray(shs_l, dtype=np.int64)
                    order = np.argsort(ids, kind="stable")
                    ids, shs = ids[order], shs[order]
                    iu, ju = np.triu_indices(len(ids), k=1)
                    z = np.bitwise_xor(shs[iu], shs[ju])
                    h = pop[z.view(np.uint8).reshape(-1, 8)].sum(axis=1)
                    keep = h <= mh
                    ia.append(ids[iu[keep]])
                    ib.append(ids[ju[keep]])
                    sa.append(shs[iu[keep]])
                    sb.append(shs[ju[keep]])
                yield pd.DataFrame(
                    {
                        "id_a": np.concatenate(ia) if ia else [],
                        "id_b": np.concatenate(ib) if ib else [],
                        "sh_a": np.concatenate(sa) if sa else [],
                        "sh_b": np.concatenate(sb) if sb else [],
                    }
                )

        cand = buckets.mapInPandas(
            expand, schema="id_a long, id_b long, sh_a long, sh_b long"
        ).distinct()
        if isinstance(id_type, IntegerType):
            cand = cand.withColumn("id_a", F.col("id_a").cast("int")) \
                       .withColumn("id_b", F.col("id_b").cast("int"))
    else:
        buckets = (
            banded.groupBy("band", "bh")
            .agg(
                F.collect_list(
                    F.struct(F.col(id_col).alias("id"), "simhash")
                ).alias("ms")
            )
            .filter((F.size("ms") > 1) & (F.size("ms") <= max_bucket))
            # AQE coalesces this stage by BYTES, but the work below is
            # the O(B^2) in-array pair expansion — invisible
            # amplification that landed every bucket on one task
            # (measured 2x on the whole gate); spread buckets across
            # the cluster before expanding
            .repartition(sh.sparkSession.sparkContext.defaultParallelism)
        )
        sorted_ms = F.array_sort("ms")  # struct sort: ordered by id first
        pair_structs = F.flatten(
            F.transform(
                sorted_ms,
                lambda x, i: F.transform(
                    F.slice(sorted_ms, i + 2, F.size(sorted_ms)),
                    lambda y: F.struct(
                        x["id"].alias("id_a"),
                        y["id"].alias("id_b"),
                        x["simhash"].alias("sh_a"),
                        y["simhash"].alias("sh_b"),
                    ),
                ),
            )
        )
        close = F.filter(
            pair_structs,
            lambda s: F.bit_count(s["sh_a"].bitwiseXOR(s["sh_b"]))
            <= F.lit(max_hamming),
        )
        cand = (
            buckets.select(F.explode(close).alias("p"))
            .select("p.id_a", "p.id_b", "p.sh_a", "p.sh_b")
            .distinct()
        )
    hamming = F.bit_count(F.col("sh_a").bitwiseXOR(F.col("sh_b")))
    return cand.withColumn("hamming", hamming)


# -------------------------------------------------------- cross-corpus dedup


def minhash_lsh_pairs_cross(
    df_new: DataFrame,
    df_ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    n: int = 3,
    num_hashes: int = 32,
    bands: int = 8,
    threshold: float = 0.5,
    max_bucket: int = 1000,
    seed: int = 42,
) -> DataFrame:
    """Bipartite near-dup pairs between a NEW corpus and a REFERENCE
    corpus: (id_a from new, id_b from ref, n_a, n_b, shared, jaccard).

    The training-data case is deduplicating a fresh crawl against the
    corpus already ingested (or against held-out eval data): candidates
    come from an LSH band equi-join of new-side signatures against
    ref-side signatures — never a self-join, so no intra-corpus pairs
    are generated or paid for.  Same lean scale shape as the self-join
    variant: one-shuffle signatures per side (no materialized shingle
    tables), banded buckets with a ``max_bucket`` skew cap applied per
    side, candidate list materialized once with lineage cut, exact
    restricted-Jaccard verification over re-shingled candidate docs
    only (integer-exact threshold, SQL-oracle-reproducible).  The two
    id spaces are kept separate throughout — overlapping ids between
    corpora are fine.
    """

    # ONE pipeline for both corpora: tag each side, explode shingles,
    # aggregate signatures grouped by (side, id) in a single shuffle,
    # then bucket with a CONDITIONAL collect per side in a second single
    # shuffle — versus the previous two-sided formulation (a signature
    # agg and a bucket agg per side plus an equi-join) this halves the
    # stage count and shuffles the same bytes.  Per-side skew cap
    # unchanged: a bucket hotter than max_bucket on EITHER side drops.
    tagged = df_new.select(
        F.lit(0).alias("__side"), F.col(id_col), F.col(text_col)
    ).unionByName(
        df_ref.select(F.lit(1).alias("__side"), F.col(id_col), F.col(text_col))
    )
    tok = shingled(tagged, id_col, text_col, n, group_cols=("__side",)).select(
        "__side", id_col, F.pmod(F.col("sh"), F.lit(MERSENNE)).alias("x")
    )
    sig = _minhash_agg(
        tok, id_col, _minhash_params(num_hashes, seed),
        group_cols=["__side", id_col],
    )
    banded = _band_hashes(
        sig.withColumn("__sid", F.struct("__side", id_col)),
        "__sid", "__sid", num_hashes, bands,
    )
    is_new = F.col("__sid.__side") == 0
    buckets = (
        banded.groupBy("band", "bh")
        .agg(
            F.collect_list(F.when(is_new, F.col(f"__sid.{id_col}"))).alias("ids_a"),
            F.collect_list(F.when(~is_new, F.col(f"__sid.{id_col}"))).alias("ids_b"),
        )
        .filter(
            (F.size("ids_a") > 0) & (F.size("ids_a") <= max_bucket)
            & (F.size("ids_b") > 0) & (F.size("ids_b") <= max_bucket)
        )
    )
    candidates, localized = _cut_lineage_pairs(
        buckets.select(F.explode("ids_a").alias("id_a"), "ids_b")
        .select("id_a", F.explode("ids_b").alias("id_b")),
        dedup=True,
    )

    # verify: ONE tagged pipeline builds both sides' candidate shingle
    # sets (semi-join on (side, id), one distinct, one arrays agg), then
    # the array-intersect verify — same shape as the self-join variant
    cids = candidates.select(
        F.lit(0).alias("__side"), F.col("id_a").alias(id_col)
    ).unionByName(
        candidates.select(F.lit(1).alias("__side"), F.col("id_b").alias(id_col))
    ).distinct()
    if localized:
        cids = F.broadcast(cids)
    sub = tagged.join(cids, ["__side", id_col], "left_semi")
    tsh = shingled(sub, id_col, text_col, n, group_cols=("__side",), distinct=True)
    arrs = tsh.groupBy("__side", id_col).agg(F.collect_list("sh").alias("__shs"))
    if _VERIFY_PERSIST:
        # same dual-reference cut as verify_jaccard_pairs_from_shingles:
        # aa and bb below otherwise re-execute the tagged corpus re-scan
        # + shingle window once per side
        from .parallel import cached_leaf

        arrs = cached_leaf(arrs.persist())
    aa = arrs.filter(F.col("__side") == 0).select(
        F.col(id_col).alias("id_a"), F.col("__shs").alias("__sa")
    )
    bb = arrs.filter(F.col("__side") == 1).select(
        F.col(id_col).alias("id_b"), F.col("__shs").alias("__sb")
    )
    return (
        candidates.join(aa, "id_a")
        .join(bb, "id_b")
        .select(
            "id_a",
            "id_b",
            F.size("__sa").alias("n_a"),
            F.size("__sb").alias("n_b"),
            F.size(F.array_intersect("__sa", "__sb")).alias("shared"),
        )
        .withColumn("union_", F.col("n_a") + F.col("n_b") - F.col("shared"))
        # same threshold arithmetic as _jaccard_from_shared: identical
        # IEEE754 evaluation on both engines, oracle-reproducible
        .filter(F.col("shared") >= F.lit(threshold) * F.col("union_"))
        .select(
            "id_a", "id_b", "n_a", "n_b", "shared",
            F.round(F.col("shared") / F.col("union_"), 4).alias("jaccard"),
        )
    )


def dedup_against(
    df_new: DataFrame,
    df_ref: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    **kwargs,
) -> DataFrame:
    """Rows of ``df_new`` that are NOT near-duplicates of anything in
    ``df_ref`` — the "dedup the new crawl against the existing corpus"
    step.  Anti-join on the cross pair list's new-side ids (near-dup
    fraction is small, so the loser list broadcasts at any sane
    scale)."""
    pairs = minhash_lsh_pairs_cross(
        df_new, df_ref, id_col=id_col, text_col=text_col, **kwargs
    )
    losers = pairs.select(F.col("id_a").alias(id_col)).distinct()
    return df_new.join(losers, id_col, "left_anti")


def chunk_table(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
) -> DataFrame:
    """(id, chunk_idx, chunk): consecutive ``chunk_words``-word windows
    of the whitespace-normalized lowercased text (last chunk may be
    shorter).  Pure codegen, no Python.

    A greedy regex partitions the normalized text into its chunks in
    ONE JVM regex pass — ``\\S+( \\S+){0,k-1}`` consumes exactly
    ``chunk_words`` words per match (fewer on the final remnant),
    byte-identical to the previous split/slice/concat_ws spelling but
    without the per-chunk higher-order ``F.transform`` lambda, which
    Spark evaluates interpreted (measured 3.3× slower on a 36k-chunk
    corpus).  Whitespace-only text yields zero chunks instead of one
    empty chunk; ``dedup_chunks`` output is unaffected (empty
    reassemblies are dropped or backfilled identically)."""
    norm = F.regexp_replace(F.lower(F.trim(F.col(text_col))), "\\s+", " ")
    chunks = F.regexp_extract_all(
        norm, F.lit(f"\\S+( \\S+){{0,{chunk_words - 1}}}"), 0
    )
    return df.select(
        F.col(id_col), F.posexplode(chunks).alias("chunk_idx", "chunk")
    )


def dedup_chunks(
    df: DataFrame,
    id_col: str = "doc_id",
    text_col: str = "text",
    chunk_words: int = 8,
    drop_empty: bool = True,
    winner: str = "auto",
    window_threshold_bytes: int = 64 << 20,
) -> DataFrame:
    """Corpus-wide exact duplicate-PASSAGE removal (the C4 rule, at
    chunk granularity): every repeated ``chunk_words``-word window is
    deleted from all but its first occurrence — first = lowest
    (doc id, chunk index) — and each document is reassembled from its
    surviving chunks.  Documents whose every chunk was a repeat drop
    out entirely when ``drop_empty``.

    Two identical-result winner strategies, picked by the optimizer's
    input-size estimate (same cost-based pattern as
    ``functions.profile``):

    - ``'join'`` (the 100 TB path): chunks shuffle ONCE on the chunk
      text to find each group's first occurrence via
      min(struct(id, idx)) — a map-side partial aggregate, so a
      pathologically common chunk ("click here to subscribe")
      combines per-partition instead of piling one reducer; the
      winner join then reuses the same hash partitioning.
    - ``'window'`` (small inputs): one window-min over the chunk
      partition — a single shuffle, no join, but every occurrence of
      a hot chunk lands in one partition, which is exactly what the
      agg+join exists to avoid at scale.

    Reassembly is one further shuffle by document id.  No Python, no
    driver-side state, no cap needed.
    """
    chunks = chunk_table(df, id_col, text_col, chunk_words)
    if winner == "auto":
        try:
            est = int(
                df._jdf.queryExecution().optimizedPlan().stats().sizeInBytes()
            )
        except Exception:
            est = 1 << 62
        winner = "window" if est <= window_threshold_bytes else "join"
    if winner == "window":
        w = Window.partitionBy("chunk")
        survivors = (
            chunks.withColumn(
                "__first",
                F.min(F.struct(id_col, "chunk_idx")).over(w),
            )
            .filter(
                (F.col(f"__first.{id_col}") == F.col(id_col))
                & (F.col("__first.chunk_idx") == F.col("chunk_idx"))
            )
            .select(id_col, "chunk_idx", "chunk")
        )
    else:
        first = chunks.groupBy("chunk").agg(
            F.min(F.struct(id_col, "chunk_idx")).alias("__first")
        )
        survivors = (
            chunks.join(first, "chunk")
            .filter(
                (F.col(f"__first.{id_col}") == F.col(id_col))
                & (F.col("__first.chunk_idx") == F.col("chunk_idx"))
            )
            .select(id_col, "chunk_idx", "chunk")
        )
    out = survivors.groupBy(id_col).agg(
        F.concat_ws(
            " ",
            F.transform(
                F.array_sort(
                    F.collect_list(F.struct("chunk_idx", "chunk"))
                ),
                lambda s: s.chunk,
            ),
        ).alias(text_col)
    )
    if drop_empty:
        return out.filter(F.length(text_col) > 0)
    # a doc whose every chunk was a repeat has no surviving rows at
    # all — resurface it with empty text
    ids = df.select(id_col).distinct()
    return ids.join(out, id_col, "left").fillna({text_col: ""})


# --------------------------------------------------------------------
# Repeated-passage detection (content-defined fingerprint sampling)
# --------------------------------------------------------------------

_SPAN_BASE = 31  # polynomial hash base (codepoint polynomial, mod 2^64)


def _span_coeffs(gram_len: int):
    import numpy as np

    return np.array(
        [pow(_SPAN_BASE, gram_len - 1 - j, 1 << 64) for j in range(gram_len)],
        dtype=np.uint64,
    )


def span_fingerprints(
    df: DataFrame,
    gram_len: int = 20,
    rate: int = 8,
    id_col: str = "doc_id",
    text_col: str = "text",
) -> DataFrame:
    """Content-defined fingerprint sample of every document:
    ``(id, p, h)`` rows where ``h`` is the base-31 codepoint-polynomial
    hash (mod 2^64, cast to signed for Spark) of the ``gram_len``-char
    gram at position ``p``, SELECTED where ``h % rate == 0``.

    Hash-mod selection is phase-independent (the same substring selects
    the same positions wherever it appears — unlike aligned-stride
    grams, which miss shifted copies), and the oracle can replay the
    polynomial exactly (codepoints via ``ord``, hugeint mod 2^64).  A
    shared passage of length L >= gram_len is missed with probability
    ``(1 - 1/rate)^(L - gram_len + 1)`` — ~2e-5 at L=100, g=20, rate=8.

    Scale shape: ONE map-only Arrow pass computes rolling hashes
    vectorized per doc (UTF-32 codepoints, sliding-window GEMM) and
    emits only the ~chars/rate selected fingerprints; nothing
    corpus-sized shuffles (``spread_scan`` only widens a
    few-row-group scan to the session's cores, the tfidf fix).
    """
    import numpy as np

    from .parallel import spread_scan

    coeffs = _span_coeffs(gram_len)
    id_t = df.schema[id_col].dataType.simpleString()
    out_schema = f"`{id_col}` {id_t}, p long, h long"
    df = spread_scan(df.select(id_col, text_col))

    def scan(batches):
        import pyarrow as pa

        for b in batches:
            ids_out, ps, hs = [], [], []
            texts = b.column(1).to_pylist()
            for i, t in enumerate(texts):
                if t is None or len(t) < gram_len:
                    continue
                cps = np.frombuffer(
                    t.encode("utf-32-le"), np.uint32
                ).astype(np.uint64)
                win = np.lib.stride_tricks.sliding_window_view(
                    cps, gram_len
                )
                with np.errstate(over="ignore"):
                    h = (win * coeffs[None, :]).sum(
                        axis=1, dtype=np.uint64
                    )
                sel = np.flatnonzero(h % np.uint64(rate) == 0)
                if not len(sel):
                    continue
                ids_out.append(
                    b.column(0).take(
                        pa.array(np.full(len(sel), i, dtype=np.int64))
                    )
                )
                ps.append(sel.astype(np.int64))
                hs.append(h[sel].astype(np.int64))
            if not ids_out:
                continue
            yield pa.RecordBatch.from_arrays(
                [
                    pa.concat_arrays(ids_out),
                    pa.array(np.concatenate(ps)),
                    pa.array(np.concatenate(hs)),
                ],
                names=[id_col, "p", "h"],
            )

    return df.select(id_col, text_col).mapInArrow(scan, out_schema)


def _lcp_len(a, b):
    """Longest-common-prefix length of two string Columns (pure
    Catalyst): null-safe char-array zip, first mismatch index; equal
    prefixes fall through to the shorter length.  Inputs are bounded
    context windows (<= max_extend chars), so the char arrays are
    tiny."""
    eq = F.zip_with(
        F.split(a, ""), F.split(b, ""), lambda x, y: x.eqNullSafe(y)
    )
    pos = F.array_position(eq, F.lit(False))
    return F.when(pos > 0, pos - 1).otherwise(
        F.least(F.length(a), F.length(b))
    ).cast("long")


def _merged_dup_spans(
    df: DataFrame,
    gram_len: int,
    rate: int,
    min_count: int,
    id_col: str,
    text_col: str,
    max_extend: int = 0,
):
    """Merged duplicated-span islands ``(id, island, s, e)`` shared by
    ``repeated_span_stats`` and ``remove_repeated_spans``.

    ``max_extend > 0`` adds the exact verify stage: each duplicated
    fingerprint (a SEED gram) is extended left/right to the maximal
    passage shared EXACTLY by its whole duplicate group, capped at
    ``max_extend`` chars per side.  Group agreement is the longest
    common extension over all occurrences, computed as
    ``LCP(lexmin, lexmax)`` of the per-occurrence context windows (the
    set-LCP identity) — so the extended span is guaranteed to occur as
    many times as the seed did.  Extension never crosses a document
    boundary (the context window is truncated there).

    Scale shape: contexts are sliced by a doc-keyed join of the
    (small) anchor list against the text — only duplicated docs' text
    moves, and only ``2 * max_extend`` chars ride per anchor into the
    hash-keyed group reduce.  Everything stays proportional to the
    sampled fingerprints, never the corpus.
    """
    fps = span_fingerprints(df, gram_len, rate, id_col, text_col)
    wcnt = Window.partitionBy("h")
    dup = fps.withColumn("__n", F.count(F.lit(1)).over(wcnt)).filter(
        F.col("__n") >= min_count
    )
    if max_extend > 0:
        w = max_extend
        perdoc = dup.groupBy(id_col).agg(
            F.collect_list(F.struct("p", "h")).alias("__as")
        )
        t = F.col("__t")
        p = F.col("__a.p")
        ctx = (
            df.select(id_col, F.col(text_col).alias("__t"))
            .join(perdoc, id_col)
            .select(id_col, "__t", F.explode("__as").alias("__a"))
            .select(
                F.col("__a.h").alias("h"),
                F.reverse(
                    t.substr(
                        (F.greatest(p - w, F.lit(0)) + 1).cast("int"),
                        F.least(p, F.lit(w)).cast("int"),
                    )
                ).alias("__lc"),
                t.substr((p + gram_len + 1).cast("int"), F.lit(w)).alias(
                    "__rc"
                ),
            )
        )
        ext = ctx.groupBy("h").agg(
            _lcp_len(F.min("__lc"), F.max("__lc")).alias("__L"),
            _lcp_len(F.min("__rc"), F.max("__rc")).alias("__R"),
        )
        seeds = dup.join(ext, "h").select(
            id_col,
            (F.col("p") - F.col("__L")).alias("s"),
            (F.col("p") + F.lit(gram_len) + F.col("__R")).alias("e"),
        )
    else:
        seeds = dup.select(
            id_col,
            F.col("p").alias("s"),
            (F.col("p") + F.lit(gram_len)).alias("e"),
        )
    wdoc = (
        Window.partitionBy(id_col)
        .orderBy("s")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    return (
        seeds.withColumn(
            "__brk",
            F.when(
                F.col("s")
                > F.coalesce(F.max("e").over(wdoc), F.lit(-1)),
                F.lit(1),
            ).otherwise(F.lit(0)),
        )
        .withColumn(
            "island",
            F.sum("__brk").over(
                Window.partitionBy(id_col)
                .orderBy("s")
                .rowsBetween(Window.unboundedPreceding, 0)
            ),
        )
        .groupBy(id_col, "island")
        .agg(F.min("s").alias("s"), F.max("e").alias("e"))
    )


def repeated_span_stats(
    df: DataFrame,
    gram_len: int = 20,
    rate: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_extend: int = 0,
) -> DataFrame:
    """Per-document repeated-passage report:
    ``(id, n_dup_spans, dup_chars, n_chars, dup_frac)``.

    A fingerprint (see ``span_fingerprints``) is DUPLICATED when its
    hash occurs >= ``min_count`` times corpus-wide; each duplicated
    fingerprint marks the span ``[p, p + gram_len)`` and overlapping /
    touching spans merge (gaps-and-islands window).  Documents with no
    duplicated fingerprint are absent — same contract as
    ``contamination_check``.  With ``max_extend=0`` the spans are SEED
    spans (the sampled grams); ``max_extend > 0`` runs the exact
    verify stage (see ``_merged_dup_spans``), extending each seed to
    the maximal passage its whole duplicate group shares.

    Shuffles: one fingerprint exchange keyed by the 8-byte hash (the
    duplicate count window) and one keyed by ``id_col`` (the island
    merge) — both over the sampled ~chars/rate rows, never the corpus
    text (extension adds a bounded-context slice join over duplicated
    docs only).
    """
    spans = _merged_dup_spans(
        df, gram_len, rate, min_count, id_col, text_col, max_extend
    )
    lens = df.select(id_col, F.length(text_col).alias("n_chars"))
    return (
        spans.groupBy(id_col)
        .agg(
            F.count(F.lit(1)).cast("int").alias("n_dup_spans"),
            F.sum(F.col("e") - F.col("s")).alias("dup_chars"),
        )
        .join(lens, id_col)
        .select(
            id_col,
            "n_dup_spans",
            "dup_chars",
            "n_chars",
            F.round(
                F.col("dup_chars") / F.col("n_chars"), 4
            ).alias("dup_frac"),
        )
    )


def remove_repeated_spans(
    df: DataFrame,
    gram_len: int = 20,
    rate: int = 8,
    min_count: int = 2,
    id_col: str = "doc_id",
    text_col: str = "text",
    max_extend: int = 0,
) -> DataFrame:
    """Cut every duplicated span (see ``repeated_span_stats``) out of
    the text: ``(id, text)`` with the merged spans removed and the
    surviving segments concatenated in order.  Documents without
    duplicated fingerprints pass through unchanged.  ``max_extend > 0``
    cuts the exactly-extended passages (whole repeated passages, not
    sampled windows — see ``_merged_dup_spans``).

    The cut itself is a pure-Catalyst ``aggregate`` fold over the
    doc's sorted span array (no Python in the corpus-sized path): the
    accumulator carries (chars consumed, output so far) and each span
    appends the clean segment before it.
    """
    spans = (
        _merged_dup_spans(
            df, gram_len, rate, min_count, id_col, text_col, max_extend
        )
        .groupBy(id_col)
        .agg(
            F.array_sort(
                F.collect_list(F.struct("s", "e"))
            ).alias("__spans")
        )
    )
    joined = df.select(id_col, text_col).join(spans, id_col, "left")
    cut = F.aggregate(
        F.col("__spans"),
        F.struct(
            F.lit(0).cast("long").alias("pos"),
            F.lit("").alias("out"),
        ),
        lambda acc, sp: F.struct(
            sp.e.alias("pos"),
            F.concat(
                acc.out,
                F.col(text_col).substr(
                    (acc.pos + 1).cast("int"), (sp.s - acc.pos).cast("int")
                ),
            ).alias("out"),
        ),
        lambda acc: F.concat(
            acc.out,
            F.col(text_col).substr(
                (acc.pos + 1).cast("int"),
                (F.length(text_col) - acc.pos).cast("int"),
            ),
        ),
    )
    return joined.select(
        id_col,
        F.when(F.col("__spans").isNull(), F.col(text_col))
        .otherwise(cut)
        .alias(text_col),
    )
