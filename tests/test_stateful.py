"""Low-level stateful replica checks: the hand-rolled symmetric join and
timer-driven aggregator must agree with their declarative twins on bounded
replay (modulo windows still open at end-of-stream, which timers can't fire
for — exactly the reference's semantics for an unterminated stream)."""

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.sources.tables import nexmark_streams
from nexmark_vanilla_flink_spark.streaming.runner import run_available_now
from nexmark_vanilla_flink_spark.streaming.sources import stream_nexmark
from nexmark_vanilla_flink_spark.streaming.stateful import (
    hot_items_stateful,
    union_join_stateful,
)


def _rows(df):
    return sorted([tuple(r) for r in df.collect()], key=repr)


def test_union_join_stateful_matches_batch_join(spark, sf_dir):
    s = stream_nexmark(spark, sf_dir)
    out = run_available_now(
        union_join_stateful(s["persons"], s["auctions"]),
        output_mode="append",
        name="ujs",
    )
    b = nexmark_streams(spark, sf_dir)
    batch = (
        b["persons"]
        .select("user_id", "person_id")
        .join(
            b["auctions"].select(
                F.col("seller_id").alias("user_id"), "auction_id"
            ),
            "user_id",
        )
        .select("user_id", "person_id", "auction_id")
    )
    assert _rows(out) == _rows(batch)


def test_hot_items_stateful_emits_closed_windows_correctly(spark, sf_dir):
    s = stream_nexmark(spark, sf_dir)
    out = run_available_now(
        hot_items_stateful(s["bids"]), output_mode="append", name="his"
    )
    from nexmark_vanilla_flink_spark.plans.nexmark import q5_hot_items

    batch = {
        (r["auction_id"], r["w_start_s"]): (
            r["max_bid"],
            r["bid_count"],
            r["last_bid_ts_s"],
        )
        for r in q5_hot_items(spark, sf_dir).collect()
    }
    emitted = out.collect()
    # timers for the final windows can't fire after end-of-stream — emitted
    # set is a subset; every emitted row must exactly match the batch value
    assert len(emitted) > 0
    for r in emitted:
        key = (r["auction_id"], r["w_start_s"])
        assert key in batch
        assert batch[key] == (r["max_bid"], r["bid_count"], r["last_bid_ts_s"])
