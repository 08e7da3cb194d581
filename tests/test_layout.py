"""Layout-tier physical properties: the bucketed join must be
exchange-free on the join path, and the skew profile must report the
known-skewed key hotter than the uniform one."""

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.plans import REGISTRY


def test_bucketed_join_has_no_join_exchange(spark, sf_dir):
    df = REGISTRY["bucketed_colocated_join"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the single exchange is the few-row priority rollup ABOVE the join;
    # the join itself consumes the bucketed scans directly
    assert plan.count("Exchange") == 1, plan
    assert "SortMergeJoin" in plan
    assert plan.count("Bucketed: true") == 2, plan
    # bucketed scans are pre-sorted on the join key: no Sort below the join
    join_pos = plan.index("SortMergeJoin")
    assert "Sort " not in plan[join_pos:], plan[join_pos : join_pos + 500]


def test_bucketed_join_rewrites_are_idempotent(spark, sf_dir):
    a = REGISTRY["bucketed_colocated_join"].spark(spark, sf_dir).collect()
    b = REGISTRY["bucketed_colocated_join"].spark(spark, sf_dir).collect()
    assert sorted(map(tuple, a)) == sorted(map(tuple, b))


def test_skew_profile_orders_event_type_hotter_than_user_id(spark, sf_dir):
    rows = {
        r["rel"]: r
        for r in REGISTRY["key_skew_profile"].spark(spark, sf_dir).collect()
    }
    assert set(rows) == {
        "events.user_id",
        "events.event_type",
        "lineitem.l_partkey",
    }
    # 5 event types over many rows vs ~thousands of user ids: the
    # low-cardinality key must profile as the (much) heavier top-1 share
    assert (
        rows["events.event_type"]["top1_share"]
        > rows["events.user_id"]["top1_share"]
    )
    for r in rows.values():
        assert r["n_rows"] > 0 and r["n_keys"] > 0
        assert 0.0 < r["top1_share"] <= 1.0
        assert r["top1_share"] <= r["top10_share"] <= 1.0
        assert r["skew_factor"] >= 0.99  # max >= mean up to rounding


def test_partitioned_scan_prunes_directories(spark, sf_dir):
    df = REGISTRY["partitioned_pruned_scan"].spark(spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    # the event_type predicate must resolve against directory names, not rows
    assert "PartitionFilters: [" in plan
    assert "event_type" in plan.split("PartitionFilters:")[1][:200], plan
    # and the scan carries NO row-level filters at all: the predicate was
    # consumed entirely by directory pruning
    assert "DataFilters: []" in plan, plan
