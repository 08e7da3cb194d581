"""CLI entry dispatch — parity with the reference's single entry point
(kernel/Main.java:23-70: ``--debug|q8|cm|q8fc|q5fc|q11fc|q5|qx|q0|q5b`` flag
dispatch into env-mutating run methods, then ``env.execute``).

    python -m nexmark_vanilla_flink_spark --q5 [--stream] [--sf-dir DIR]
    python -m nexmark_vanilla_flink_spark --list

Batch mode runs the registered plan and prints a sample + row count;
--stream replays the testdata through the Structured Streaming twin
(Trigger.AvailableNow) where one exists.
"""

from __future__ import annotations

import argparse
import sys
import time

# flag → registry query name (batch) and streaming twin builder name
_FLAG_TO_QUERY = {
    "q5": "q5_hot_items",
    "q5_sliding": "q5_sliding",
    "q8": "q8_new_users_auctions",
    "q11": "q11_user_bids",
    "qx": "qx_winning_bids",
    "sessions": "sessions_by_bidder",
    "cm": "cm_load_per_job",
    "q0": "event_type_stats",
}


def main(argv: list[str] | None = None) -> int:
    ap = argparse.ArgumentParser(prog="nexmark_vanilla_flink_spark")
    for flag in _FLAG_TO_QUERY:
        ap.add_argument(f"--{flag}", action="store_true")
    ap.add_argument("--query", action="append", default=[],
                    help="any registered query name (see --list); repeatable")
    ap.add_argument("--list", action="store_true", help="list registered queries")
    ap.add_argument("--stream", action="store_true", help="run the streaming twin")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.001")
    ap.add_argument("--show", type=int, default=5, help="rows to print")
    ap.add_argument(
        "--soak",
        type=int,
        metavar="SECONDS",
        help="run the live pipeline (rate generator → q5 window agg → "
        "latency stats) for N seconds and print throughput/latency",
    )
    ap.add_argument(
        "--rate", type=int, default=50_000, help="events/s for --soak"
    )
    args = ap.parse_args(argv)

    if args.soak:
        return _run_soak(args.soak, args.rate)

    from .plans import REGISTRY

    if args.list:
        for name, q in sorted(REGISTRY.items()):
            kind = "oracle" if q.oracle else "rows-only"
            print(f"{name:32s} [{kind}] {q.tags}")
        return 0

    names = [q for f, q in _FLAG_TO_QUERY.items() if getattr(args, f)]
    names.extend(args.query)
    if not names:
        ap.error("pick a query flag (e.g. --q5), --query NAME, or --list")

    from .session import get_session

    spark = get_session("nexmark-cli")
    spark.sparkContext.setLogLevel("ERROR")
    for name in names:
        if name not in REGISTRY:
            print(f"unknown query: {name}", file=sys.stderr)
            return 2
        t0 = time.perf_counter()
        if args.stream:
            df = _run_stream(spark, name, args.sf_dir)
        else:
            df = REGISTRY[name].spark(spark, args.sf_dir)
        n = df.count()
        dt = time.perf_counter() - t0
        print(f"== {name} ({'stream' if args.stream else 'batch'}): "
              f"{n} rows in {dt:.2f}s ==")
        df.show(args.show, truncate=False)
    spark.stop()
    return 0


def _run_soak(seconds: int, rate: int) -> int:
    """Live end-to-end soak: synthetic skewed generator (S1-S4) → event-time
    windowed hot-items aggregation (A1) → memory sink, with listener-based
    throughput accounting (K4) — the whole streaming engine running hot."""
    import tempfile
    import time

    from pyspark.sql import functions as F

    from .session import get_session
    from .sources.generator import generate_events_stream, split_streams
    from .streaming.listener import ProgressCapture

    spark = get_session("nexmark-soak")
    spark.sparkContext.setLogLevel("ERROR")
    cap = ProgressCapture()
    spark.streams.addListener(cap)
    bids = split_streams(generate_events_stream(spark, rows_per_second=rate))["bids"]
    agg = (
        bids.withWatermark("b_ts", "2 seconds")
        .groupBy(F.window("b_ts", "10 seconds"), F.col("auction_id"))
        .agg(F.max("bid").alias("max_bid"), F.count(F.lit(1)).alias("n"))
    )
    q = (
        agg.writeStream.format("memory")
        .queryName("soak")
        .outputMode("update")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_soak_"))
        .trigger(processingTime="1 second")
        .start()
    )
    t0 = time.time()
    time.sleep(seconds)
    # stopping a hot stream aborts the in-flight micro-batch by design;
    # silence the JVM teardown noise so the summary line is readable
    spark.sparkContext.setLogLevel("OFF")
    q.stop()
    q.awaitTermination(60)
    wall = time.time() - t0
    rows = cap.total_input_rows()
    done = len([p for p in cap.progress if p["numInputRows"] > 0])
    note = (
        ""
        if done
        else " [saturated: no micro-batch completed before stop — lower --rate]"
    )
    print(
        f"soak: {rows} events in {wall:.1f}s "
        f"({int(rows / wall)} ev/s sustained of {rate} offered), "
        f"{done} completed micro-batches, "
        f"{spark.table('soak').count()} agg rows emitted{note}"
    )
    spark.stop()
    return 0


def _run_stream(spark, name: str, sf_dir: str):
    from .streaming.queries import (
        cm_stream,
        q5_hot_items_stream,
        sessions_stream,
    )
    from .streaming.runner import run_available_now
    from .streaming.sources import stream_events, stream_nexmark

    if name == "q5_hot_items":
        s = stream_nexmark(spark, sf_dir)
        return run_available_now(q5_hot_items_stream(s["bids"]), "complete")
    if name == "sessions_by_bidder":
        s = stream_nexmark(spark, sf_dir)
        return run_available_now(sessions_stream(s["bids"]), "complete")
    if name == "cm_load_per_job":
        return run_available_now(cm_stream(stream_events(spark, sf_dir)), "complete")
    raise SystemExit(f"no streaming twin wired for {name}")


if __name__ == "__main__":
    raise SystemExit(main())
