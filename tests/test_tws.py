"""transformWithStateInPandas replica: same contract as the
applyInPandasWithState one — every emitted (timer-closed) window must match
the declarative batch aggregation exactly."""

import pytest

from nexmark_vanilla_flink_spark.plans.nexmark import q5_hot_items
from nexmark_vanilla_flink_spark.streaming.runner import run_available_now
from nexmark_vanilla_flink_spark.streaming.sources import stream_nexmark
from nexmark_vanilla_flink_spark.streaming.tws import hot_items_tws, tws_available


@pytest.mark.skipif(
    not tws_available(),
    reason="transformWithStateInPandas requires google.protobuf (absent in container)",
)
def test_hot_items_tws_emits_closed_windows_correctly(spark, sf_dir):
    s = stream_nexmark(spark, sf_dir)
    out = run_available_now(hot_items_tws(s["bids"]), output_mode="append", name="tws")
    batch = {
        (r["auction_id"], r["w_start_s"]): (
            r["max_bid"],
            r["bid_count"],
            r["last_bid_ts_s"],
        )
        for r in q5_hot_items(spark, sf_dir).collect()
    }
    emitted = out.collect()
    assert len(emitted) > 0
    for r in emitted:
        key = (r["auction_id"], r["w_start_s"])
        assert key in batch, key
        assert batch[key] == (r["max_bid"], r["bid_count"], r["last_bid_ts_s"]), key
