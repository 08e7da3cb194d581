"""Batch ≡ stream parity (SURVEY.md §7 step 7): replay the testdata through
Structured Streaming with Trigger.AvailableNow and compare against the batch
plans. Complete-mode aggregations must match exactly; append-mode join
streams must emit exactly the batch join rows."""

import pytest
from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.plans.nexmark import (
    cm_load_per_job,
    q5_hot_items,
    sessions_by_bidder,
)
from nexmark_vanilla_flink_spark.sources.tables import nexmark_streams
from nexmark_vanilla_flink_spark.streaming.queries import (
    cm_stream,
    q5_hot_items_stream,
    q8_join_stream,
    qx_winning_bids_stream,
    sessions_stream,
)
from nexmark_vanilla_flink_spark.streaming.runner import (
    run_available_now,
    with_observed_metrics,
)
from nexmark_vanilla_flink_spark.streaming.sources import stream_events, stream_nexmark


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def test_q5_stream_matches_batch(spark, sf_dir):
    s = stream_nexmark(spark, sf_dir)
    out = run_available_now(
        q5_hot_items_stream(s["bids"]), output_mode="complete", name="q5s"
    )
    batch = q5_hot_items(spark, sf_dir)
    assert _rows(out.select(*sorted(out.columns))) == _rows(
        batch.select(*sorted(batch.columns))
    )


def test_sessions_stream_matches_batch(spark, sf_dir):
    s = stream_nexmark(spark, sf_dir)
    out = run_available_now(
        sessions_stream(s["bids"]), output_mode="complete", name="sesss"
    )
    batch = sessions_by_bidder(spark, sf_dir)
    assert _rows(out.select(*sorted(out.columns))) == _rows(
        batch.select(*sorted(batch.columns))
    )


def test_cm_stream_matches_batch(spark, sf_dir):
    ev = stream_events(spark, sf_dir)
    out = run_available_now(cm_stream(ev), output_mode="complete", name="cms")
    batch = cm_load_per_job(spark, sf_dir)
    assert _rows(out.select(*sorted(out.columns))) == _rows(
        batch.select(*sorted(batch.columns))
    )


def test_q8_join_stream_matches_batch(spark, sf_dir):
    s = stream_nexmark(spark, sf_dir)
    out = run_available_now(
        q8_join_stream(s["persons"], s["auctions"]), output_mode="append", name="q8s"
    )
    b = nexmark_streams(spark, sf_dir)
    p = b["persons"].withColumn(
        "w_start_s", F.expr("CAST(p_ts_ns DIV 86400000000000 AS BIGINT) * 86400")
    )
    a = (
        b["auctions"]
        .withColumn(
            "w_start_s",
            F.expr("CAST(start_ts_ns DIV 86400000000000 AS BIGINT) * 86400"),
        )
        .withColumnRenamed("seller_id", "user_id")
        .select("user_id", "w_start_s", "auction_id", "start_ts_ns")
    )
    batch = p.join(a, ["user_id", "w_start_s"]).select(
        "person_id", "user_id", "w_start_s", "auction_id", "start_ts_ns"
    )
    assert _rows(out.select(*sorted(out.columns))) == _rows(
        batch.select(*sorted(batch.columns))
    )


def test_qx_interval_join_stream_matches_batch(spark, sf_dir):
    s = stream_nexmark(spark, sf_dir)
    out = run_available_now(
        qx_winning_bids_stream(s["auctions"], s["bids"]),
        output_mode="append",
        name="qxs",
    )
    b = nexmark_streams(spark, sf_dir)
    a, bi = b["auctions"], b["bids"]
    batch = a.join(
        bi,
        (bi.item_id == a.category_id)
        & (bi.b_ts_ns >= a.start_ts_ns)
        & (bi.b_ts_ns < a.end_ts_ns),
    ).select("auction_id", "seller_id", "bid_id", "bid", "b_ts_ns")
    assert _rows(out.select(*sorted(out.columns))) == _rows(
        batch.select(*sorted(batch.columns))
    )


def test_observed_metrics_and_progress(spark, sf_dir):
    """K4: observe() metrics surface row counts via StreamingQueryProgress."""
    ev = stream_events(spark, sf_dir)
    observed = with_observed_metrics(ev.filter(F.col("event_type") == "purchase"))
    out = run_available_now(observed, output_mode="append", name="obs")
    n = out.count()
    assert n > 0


def test_event_type_stats_stream_matches_batch(spark, sf_dir):
    """ADVICE r4: the CLI's --stream twin for event_type_stats must be a
    twin of ITSELF (per-type stats), not the q7 windowed arg-max."""
    from nexmark_vanilla_flink_spark.plans.nexmark import event_type_stats
    from nexmark_vanilla_flink_spark.streaming.queries import (
        event_type_stats_stream,
    )

    ev = stream_events(spark, sf_dir)
    out = run_available_now(
        event_type_stats_stream(ev), output_mode="complete", name="etss"
    )
    batch = event_type_stats(spark, sf_dir)
    assert _rows(out.select(*sorted(out.columns))) == _rows(
        batch.select(*sorted(batch.columns))
    )
