"""DSIR-style data selection: hashed n-gram importance weights.

Data Selection via Importance Resampling (Xie et al., NeurIPS 2023 —
public method) scores every raw-corpus document by how much it "looks
like" a small target corpus, using two bag-of-hashed-n-gram unigram
models.  Documents are then resampled proportionally to
``exp(log_weight)`` (see ``sampling.hash_fraction_sample`` /
``weighted_domain_mix`` for the resampling step) to tilt a crawl-scale
corpus toward a quality target (e.g. Wikipedia+books) without training
a classifier.

Model definition (deterministic, engine-independent — a SQL oracle can
replay it exactly):

* tokens(d)  = ``split(trim(text), '\\s+')``
* features   = unigram tokens plus consecutive-pair bigrams
  (``w[i] || ' ' || w[i+1]``), every OCCURRENCE counted
* bucket(g)  = first 8 hex chars of ``md5(g)`` as an integer,
  mod ``n_buckets`` — md5 so any engine reproduces the bucketing
* raw bucket counts ``r_b`` over the whole corpus, target counts
  ``t_b`` over the target subset; ``R = Σr_b``, ``T = Σt_b``
* ``λ_b = ln((t_b+1)/(T+B)) − ln((r_b+1)/(R+B))`` (add-one smoothing
  over ``B = n_buckets`` buckets)
* ``log_weight(d) = Σ_b c_{d,b} · λ_b`` rounded to 6 decimals, where
  ``c_{d,b}`` counts the document's feature occurrences in bucket b.

Spark-first design
------------------
* Features come from ONE ``posexplode`` of the word stream; the bigram
  partner arrives via a ``lead()`` window over ``(doc, pos)`` — the
  same codegen window-shingle pattern as ``dedup.shingled`` (HOF
  ``transform``/``zip_with`` lambdas evaluate interpreted; SCALE.md
  HOF findings), except the STRING gram is kept because the md5 bucket
  must be engine-reproducible.  Both feature branches project off the
  same windowed subtree, so the doc-keyed exchange is built once and
  reused.
* Both bucket histograms are ``B``-row aggregates — map-side partial
  combine collapses each task's stream to ≤``B`` rows, so the shuffle
  is O(B × tasks) no matter the corpus size, and the λ table is
  model-sized (≤``B`` rows) by construction: it BROADCASTS to the
  scoring join.
* Scoring aggregates ``(doc, bucket)`` first — ≤``B`` float terms per
  document, integer counts until the final ``c·λ`` dot product — then
  one doc-keyed aggregate.  One corpus-sized shuffle total (the window
  exchange); the per-doc λ dot product never shuffles gram strings.

Reference scope note: the reference engine (bmsuisse/deltalake2db) has
no text/selection operators (SURVEY.md §2.5); this is a north-star
extension for LLM training-data pipelines.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql.functions import broadcast


def md5_bucket(col: Column, n_buckets: int) -> Column:
    """Engine-reproducible feature bucket: int of the first 8 hex chars
    of md5, mod ``n_buckets`` (DuckDB:
    ``('0x' || substr(md5(g),1,8))::BIGINT % B``)."""
    return (
        F.conv(F.substring(F.md5(col), 1, 8), 16, 10).cast("long")
        % F.lit(n_buckets)
    )


def feature_buckets(
    df: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    carry_cols: tuple = (),
) -> DataFrame:
    """``(id, carry..., b)`` — one row per unigram/bigram feature
    occurrence, bucketed.  Requires row-unique ``id_col`` (each source
    row's word stream is its own document).  NULL text yields no rows.
    """
    from .parallel import spread_scan

    df = spread_scan(df)  # tokenize must not run on one row group
    words = F.split(F.trim(F.col(text_col)), "\\s+")
    ex = df.select(
        F.col(id_col), *[F.col(c) for c in carry_cols],
        F.posexplode(words).alias("__pos", "__w"),
    )
    win = Window.partitionBy(id_col).orderBy("__pos")
    exw = ex.withColumn("__w2", F.lead("__w", 1).over(win))
    base = [F.col(id_col)] + [F.col(c) for c in carry_cols]
    # both features ride out of ONE projection: explode(array(uni, bi))
    # with a NULL bigram slot on each doc's last token, filtered after.
    # A union of two branches would erase the window's hash(doc_id)
    # output partitioning (union output is never "partitioned"), and
    # every downstream doc-keyed aggregate would re-shuffle; explode is
    # partitioning-preserving, so the window's exchange is the ONE
    # corpus shuffle in the whole dsir_logweights plan (verified
    # against the executed plan: the (doc,b) and doc aggregates show
    # no further Exchange).
    return (
        exw.select(
            *base,
            F.explode(
                F.array(
                    md5_bucket(F.col("__w"), n_buckets),
                    F.when(
                        F.col("__w2").isNotNull(),
                        md5_bucket(
                            F.concat(
                                F.col("__w"), F.lit(" "), F.col("__w2")
                            ),
                            n_buckets,
                        ),
                    ),
                )
            ).alias("b"),
        )
        .filter(F.col("b").isNotNull())
    )


def dsir_logweights(
    df: DataFrame,
    target: Column,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
) -> DataFrame:
    """Per-document DSIR log importance weight against the ``target``
    subset of the corpus.

    ``target`` is a boolean Column over ``df``'s rows selecting the
    target sample (e.g. ``F.col("lang") == "en"`` or a membership flag
    joined in beforehand).  Returns ``(id_col, n_feats, n_target_feats,
    log_weight)`` — ``n_target_feats`` is ``n_feats`` for target-slice
    documents and 0 otherwise (a per-row target flag that survives the
    aggregation); documents with no tokens (NULL text) are absent.
    Resample with ``exp(log_weight)`` as the sampling weight.

    ``n_target_feats`` is also LOAD-BEARING for the plan: it makes the
    scoring branch consume ``tc_part``, so its per-(doc, bucket)
    aggregate — and everything below it, down through the window's
    exchange — stays column-identical to the histogram branch's, and
    ReuseExchange shares ONE corpus tokenize+shuffle between them.
    Without it Catalyst prunes ``tc_part`` (and ``__tgt`` below the
    window) out of the scoring branch only, the subtrees diverge, and
    the executed plan re-scans and re-shuffles the corpus for the λ
    broadcast (observed: two FileScan+Exchange+Window chains).
    """
    feats = feature_buckets(
        df.withColumn("__tgt", target), text_col, id_col, n_buckets,
        carry_cols=("__tgt",),
    )
    # EVERYTHING derives from the per-(doc, bucket) aggregate, so the
    # corpus is tokenized/shuffled exactly once: per_bucket's (id, b)
    # aggregate rides the window's hash(id) distribution (no exchange),
    # and both histograms fold the already-tiny per_bucket rows.  Two
    # separate groupBys over `feats` would instead column-prune
    # differently (one keeps __tgt, one drops it), making the window
    # subtrees non-identical — ReuseExchange then fails and the corpus
    # tokenizes and shuffles twice (observed in the executed plan).
    #
    # per_bucket is PERSISTED: ReuseExchange shares only the window's
    # EXCHANGE between the λ-histogram branch and the scoring branch —
    # the window sort, the md5 bucketing, and this aggregate still
    # execute once per branch above the reused shuffle (the executed
    # plan shows two Window+HashAggregate chains over one
    # ReusedExchange).  Materializing the aggregate runs that md5 pass
    # ONCE (measured 1.18 -> 0.91 s min at sf0.1, identical rows), and
    # per_bucket — ≤B buckets per doc, integer counts, no text — is the
    # smallest frame in the plan, the natural checkpoint between the
    # feature pass and the two model folds at any scale.
    per_bucket = feats.groupBy(id_col, "b").agg(
        F.count(F.lit(1)).alias("c"),
        F.sum(
            F.when(F.col("__tgt"), F.lit(1)).otherwise(F.lit(0))
        ).alias("tc_part"),
    ).persist()
    hist = per_bucket.groupBy("b").agg(
        F.sum("c").alias("rc"), F.sum("tc_part").alias("tc")
    )
    tots = hist.agg(F.sum("rc").alias("R"), F.sum("tc").alias("T"))
    lam = (
        hist.crossJoin(broadcast(tots))
        .select(
            "b",
            (
                F.log(
                    (F.col("tc") + F.lit(1.0))
                    / (F.col("T") + F.lit(float(n_buckets)))
                )
                - F.log(
                    (F.col("rc") + F.lit(1.0))
                    / (F.col("R") + F.lit(float(n_buckets)))
                )
            ).alias("l"),
        )
    )
    return (
        per_bucket.join(broadcast(lam), "b")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum("tc_part").cast("long").alias("n_target_feats"),
            F.round(F.sum(F.col("c") * F.col("l")), 6).alias("log_weight"),
        )
    )


def classifier_score(
    df: DataFrame,
    weights: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    n_buckets: int = 1024,
    bias: float = 0.0,
) -> DataFrame:
    """fastText-style linear classifier inference over hashed n-grams.

    The workhorse of modern pretraining curation (CCNet's fastText
    lang-id + quality classifiers, Llama/phi-style "educational value"
    classifiers): a linear model over a hashed bag of unigram+bigram
    features.  This is the INFERENCE half — ``weights`` is a trained
    ``(b, w)`` table (bucket id → weight), model-sized by construction
    (≤``n_buckets`` rows), and the score is

        score(d) = sigmoid(bias + Σ_b c_{d,b}·w_b / Σ_b c_{d,b})

    i.e. the mean feature weight through a sigmoid — fastText's
    mean-of-ngram-embeddings composition in one dimension.  Features
    and bucketing are exactly ``feature_buckets``'s (md5, so a SQL
    oracle replays bit-for-bit); buckets absent from ``weights`` weigh
    0.

    Plan shape = ``dsir_logweights``'s scoring half: ONE corpus shuffle
    (the feature window's doc-keyed exchange), a per-(doc,bucket)
    count that rides that distribution shuffle-free, a broadcast join
    against the weight table, one doc-keyed fold.  Returns
    ``(id_col, n_feats, score)``; tokenless (NULL-text) docs are
    absent.
    """
    feats = feature_buckets(df, text_col, id_col, n_buckets)
    per_bucket = feats.groupBy(id_col, "b").agg(
        F.count(F.lit(1)).alias("c")
    )
    dotted = (
        per_bucket.join(broadcast(weights), "b", "left")
        .groupBy(id_col)
        .agg(
            F.sum("c").cast("long").alias("n_feats"),
            F.sum(F.col("c") * F.coalesce(F.col("w"), F.lit(0.0))).alias("__dot"),
        )
    )
    z = F.lit(float(bias)) + F.col("__dot") / F.col("n_feats")
    return dotted.select(
        F.col(id_col),
        F.col("n_feats"),
        F.round(F.lit(1.0) / (F.lit(1.0) + F.exp(-z)), 6).alias("score"),
    )
