"""Bucketed co-located join: identical bucketing on the join key must elide
the shuffle — the plan may not contain an Exchange between the scans and the
join — and produce the same rows as the plain join."""

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.operators.bucketing import (
    bucketed_join,
    write_bucketed,
)
from nexmark_vanilla_flink_spark.sources.tables import load_tables


def test_bucketed_join_is_exchange_free_and_correct(spark, sf_dir):
    t = load_tables(spark, sf_dir, ("orders", "lineitem"))
    orders = t["orders"].select("o_orderkey", "o_custkey", "o_totalprice")
    lineitem = t["lineitem"].select("l_orderkey", "l_quantity").withColumnRenamed(
        "l_orderkey", "o_orderkey"
    )
    write_bucketed(orders, "b_orders", "o_orderkey", n_buckets=8)
    write_bucketed(lineitem, "b_lineitem", "o_orderkey", n_buckets=8)
    # the tiny test tables would broadcast; force the sort-merge regime that
    # bucketing actually targets (fact-fact joins too big to broadcast)
    prev = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = bucketed_join(spark, "b_orders", "b_lineitem", "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "SortMergeJoin" in plan
        assert "Exchange" not in plan, "bucketed join still shuffles"
        # same result as the plain (shuffling) join
        plain = orders.join(lineitem, "o_orderkey")
        agg = lambda df: sorted(  # noqa: E731
            map(
                tuple,
                df.groupBy("o_orderkey")
                .agg(
                    F.count(F.lit(1)).alias("n"),
                    F.sum(F.col("l_quantity").cast("decimal(18,4)"))
                    .cast("decimal(38,4)")
                    .cast("double")
                    .alias("q"),
                )
                .collect(),
            )
        )
        assert agg(joined) == agg(plain)
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", prev)
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
