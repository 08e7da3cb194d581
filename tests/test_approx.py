"""Approximate-aggregate accuracy: sketches must land within their
configured error of exact answers (computed separately — see the query's
docstring for why exact distinct is kept out of the sketch plan)."""

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.plans import REGISTRY
from nexmark_vanilla_flink_spark.sources.tables import load_table


def test_approx_within_error(spark, sf_dir):
    rows = {
        r["event_type"]: r
        for r in REGISTRY["approx_user_stats"].spark(spark, sf_dir).collect()
    }
    assert rows
    exact = {
        r["event_type"]: (r["exact_users"], r["exact_median"])
        for r in load_table(spark, sf_dir, "events")
        .groupBy("event_type")
        .agg(
            F.countDistinct("user_id").alias("exact_users"),
            F.median("value").alias("exact_median"),
        )
        .collect()
    }
    for et, r in rows.items():
        e_users, e_median = exact[et]
        assert abs(r["approx_users"] - e_users) <= max(2, 0.05 * e_users), (et, r)
        # percentile_approx at accuracy 10k on continuous data: tight
        assert abs(r["approx_median_value"] - e_median) <= max(
            0.5, 0.05 * abs(e_median)
        ), (et, r)
