from __future__ import annotations

from pyspark.sql import functions as F

from deltalake2db_spark.functions.profile import profile, salted_agg


def test_profile(spark):
    df = spark.createDataFrame(
        [(1, "a", 1.5), (2, None, 2.5), (3, "a", None)], ["id", "s", "v"]
    )
    out = {r["column"]: r for r in profile(df).collect()}
    assert out["id"]["n_rows"] == 3 and out["id"]["n_null"] == 0
    assert out["s"]["n_null"] == 1 and out["s"]["n_distinct"] == 1
    assert out["v"]["min_value"] == "1.5" and out["v"]["max_value"] == "2.5"


def test_salted_agg_equals_plain(spark):
    df = spark.range(0, 10_000).select(
        (F.col("id") % 3).cast("string").alias("k"),
        (F.col("id") * 0.5).alias("v"),
    )
    salted = {r["k"]: (r["n_rows"], r["sum_value"])
              for r in salted_agg(df, "k", "v", salt_buckets=8).collect()}
    plain = {r["k"]: (r["n"], r["s"])
             for r in df.groupBy("k").agg(
                 F.count(F.lit(1)).alias("n"),
                 F.round(F.sum("v"), 2).alias("s")).collect()}
    assert salted == plain


def test_profile_strategies_agree(spark):
    df = spark.range(0, 5_000).select(
        F.col("id"),
        (F.col("id") % 7).cast("string").alias("s"),
        F.when(F.col("id") % 11 == 0, None).otherwise(F.col("id") * 0.25).alias("v"),
    )
    cols = ["id", "s", "v"]
    gather = sorted(map(tuple, profile(df, cols, strategy="gather").collect()))
    conc = sorted(map(tuple, profile(df, cols, strategy="concurrent").collect()))
    auto = sorted(map(tuple, profile(df, cols).collect()))
    assert gather == conc == auto


def test_profile_approx_one_pass(spark):
    df = spark.range(0, 20_000).select(
        F.col("id"),
        (F.col("id") % 97).cast("string").alias("s"),
        F.when(F.col("id") % 13 == 0, None).otherwise(F.col("id") * 0.5).alias("v"),
    )
    cols = ["id", "s", "v"]
    exact = {r["column"]: r for r in profile(df, cols, strategy="exact").collect()}
    approx = {r["column"]: r for r in profile(df, cols, strategy="approx").collect()}
    for c in cols:
        # HLL++ contract: ~2.3% relative error; allow 5%
        e, a = exact[c]["n_distinct"], approx[c]["n_distinct"]
        assert abs(a - e) <= max(1, 0.05 * e), (c, e, a)
        # everything except the distinct estimate is identical
        assert exact[c]["n_rows"] == approx[c]["n_rows"]
        assert exact[c]["n_null"] == approx[c]["n_null"]
        assert exact[c]["min_value"] == approx[c]["min_value"]
        assert exact[c]["max_value"] == approx[c]["max_value"]
