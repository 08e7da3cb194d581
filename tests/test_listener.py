"""K4 metrics surface: the listener must account for every input row the
streaming engine processed, and observe() metrics must come through."""

import time

from nexmark_vanilla_flink_spark.sources.tables import nexmark_streams
from nexmark_vanilla_flink_spark.streaming.listener import ProgressCapture
from nexmark_vanilla_flink_spark.streaming.queries import q5_hot_items_stream
from nexmark_vanilla_flink_spark.streaming.runner import (
    run_available_now,
    with_observed_metrics,
)
from nexmark_vanilla_flink_spark.streaming.sources import stream_nexmark


def test_listener_accounts_all_input_rows(spark, sf_dir):
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    try:
        s = stream_nexmark(spark, sf_dir)
        observed = with_observed_metrics(s["bids"], "bids_metrics")
        run_available_now(
            q5_hot_items_stream(observed), output_mode="complete", name="lst"
        )
        # listener callbacks are async — give them a beat
        for _ in range(20):
            if cap.total_input_rows() > 0:
                break
            time.sleep(0.25)
        # numInputRows counts SOURCE rows (the whole events file, pre-filter);
        # the observe() metric sits after the bid filter
        n_events = nexmark_streams(spark, sf_dir)["events"].count()
        n_bids = nexmark_streams(spark, sf_dir)["bids"].count()
        assert cap.total_input_rows() == n_events
        observed_n = [
            p["observedMetrics"]["bids_metrics"]["n_rows"]
            for p in cap.progress
            if "bids_metrics" in p["observedMetrics"]
        ]
        assert sum(observed_n) == n_bids
    finally:
        spark.streams.removeListener(cap)
