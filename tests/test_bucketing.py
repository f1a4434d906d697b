"""Bucketed co-located join: the shuffle must disappear from the plan."""

from __future__ import annotations

from pyspark.sql import functions as F

from deltalake2db_spark.operators.bucketing import (
    join_is_shuffle_free,
    read_bucketed,
    write_bucketed,
)


def test_bucketed_join_has_no_exchange(spark):
    import uuid

    suffix = uuid.uuid4().hex[:8]
    t_orders, t_lineitem = f"b_orders_{suffix}", f"b_lineitem_{suffix}"
    orders = spark.range(0, 10_000).select(
        F.col("id").alias("o_orderkey"),
        (F.col("id") % 97).alias("o_custkey"),
        (F.col("id") * 1.5).alias("o_total"),
    )
    lineitem = spark.range(0, 40_000).select(
        (F.col("id") % 10_000).alias("l_orderkey"),
        (F.col("id") % 7).alias("l_linenumber"),
        (F.col("id") * 0.25).alias("l_price"),
    )
    write_bucketed(orders, t_orders, ["o_orderkey"], num_buckets=8)
    write_bucketed(lineitem, t_lineitem, ["l_orderkey"], num_buckets=8)

    bo = read_bucketed(spark, t_orders)
    bl = read_bucketed(spark, t_lineitem)
    # merge hint: at this toy size Spark would broadcast instead; at
    # fact-fact scale the SMJ path is the one bucketing accelerates
    joined = bo.hint("merge").join(bl, bo.o_orderkey == bl.l_orderkey)

    assert join_is_shuffle_free(joined), joined._jdf.queryExecution().executedPlan().toString()
    # and it is still correct
    assert joined.count() == 40_000

    # contrast: the same merge join on unbucketed frames shuffles
    plain = orders.hint("merge").join(lineitem, orders.o_orderkey == lineitem.l_orderkey)
    assert not join_is_shuffle_free(plain)

    spark.sql(f"DROP TABLE IF EXISTS {t_orders}")
    spark.sql(f"DROP TABLE IF EXISTS {t_lineitem}")
