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
    args = ap.parse_args(argv)

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
