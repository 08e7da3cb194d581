"""Approximate-aggregate accuracy: sketches must land within their
configured error of the exact answers."""

from nexmark_vanilla_flink_spark.plans import REGISTRY


def test_approx_within_error(spark, sf_dir):
    rows = REGISTRY["approx_user_stats"].spark(spark, sf_dir).collect()
    assert rows
    for r in rows:
        exact = r["exact_users"]
        assert abs(r["approx_users"] - exact) <= max(2, 0.05 * exact), r
        assert r["approx_median_value"] is not None
