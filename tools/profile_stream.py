#!/usr/bin/env python
"""Per-entry streaming replay profiler (guide §1: measure first).

Runs every "streaming"-tagged registry entry the exact way bench.py times it
(build-inclusive, noop sink, relayouted parquet, 8 shuffle partitions) and
captures each micro-batch's StreamingQueryProgress durationMs + state-store
commit telemetry through a StreamingQueryListener, so the per-entry wall can
be decomposed into planning / addBatch / state commit / WAL / sink read-back.

Usage: python tools/profile_stream.py [entry1,entry2,...]  (default: all
streaming-tagged).  Output: /tmp/stream_profile.json + a console table.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexmark_vanilla_flink_spark.plans import REGISTRY  # noqa: E402
from nexmark_vanilla_flink_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get(
        "SPARK_GRAFT_SF_DIR", "/tmp/bench_relayout_rel_sf0.1"
    )
    passes = int(os.environ.get("PROFILE_PASSES", "3"))
    only = sys.argv[1].split(",") if len(sys.argv) > 1 else None
    names = sorted(
        n
        for n, spec in REGISTRY.items()
        if "streaming" in (spec.tags or ())
        and (only is None or n in only)
    )
    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_session("profile-stream")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")
    spark.conf.set("spark.sql.files.maxPartitionBytes", str(1024 * 1024))

    from pyspark.sql.streaming import StreamingQueryListener

    progress_log: list = []

    class L(StreamingQueryListener):
        def onQueryStarted(self, event):
            pass

        def onQueryProgress(self, event):
            p = event.progress
            progress_log.append(
                {
                    "batchId": p.batchId,
                    "durationMs": dict(p.durationMs),
                    "numInputRows": p.numInputRows,
                    "stateOperators": [
                        {
                            "operatorName": s.operatorName,
                            "commitTimeMs": s.commitTimeMs,
                            "numRowsTotal": s.numRowsTotal,
                            "numRowsUpdated": s.numRowsUpdated,
                            "memoryUsedBytes": s.memoryUsedBytes,
                        }
                        for s in p.stateOperators
                    ],
                    "sink_rows": p.sink.numOutputRows,
                }
            )

        def onQueryTerminated(self, event):
            pass

        def onQueryIdle(self, event):
            pass

    spark.streams.addListener(L())

    from nexmark_vanilla_flink_spark.streaming.runner import (
        reclaim_replay_sinks,
    )

    # session warmup (bench does the same before timing)
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    results: dict = {}
    for name in names:
        spec = REGISTRY[name]
        best, best_prog = None, None
        for p_i in range(passes):
            progress_log.clear()
            t0 = time.perf_counter()
            df = spec.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            # listener events are async — give them a beat to land
            time.sleep(0.25)
            if best is None or dt < best:
                best, best_prog = dt, list(progress_log)
            reclaim_replay_sinks()
        results[name] = {"wall_s": round(best, 3), "progress": best_prog}
        dms = {}
        st_commit = 0
        for b in best_prog:
            for k, v in b["durationMs"].items():
                dms[k] = dms.get(k, 0) + v
            for s in b["stateOperators"]:
                st_commit += s["commitTimeMs"]
        print(
            f"{name:42s} wall={best:6.3f}  batches={len(best_prog)}  "
            f"trigger={dms.get('triggerExecution', 0)/1000:5.2f}  "
            f"plan={dms.get('queryPlanning', 0)/1000:5.2f}  "
            f"addBatch={dms.get('addBatch', 0)/1000:5.2f}  "
            f"wal={(dms.get('walCommit', 0)+dms.get('commitOffsets', 0))/1000:5.2f}  "
            f"stCommit={st_commit/1000:5.2f}",
            flush=True,
        )
    with open("/tmp/stream_profile.json", "w") as f:
        json.dump(results, f, indent=1, default=str)
    print("\nwrote /tmp/stream_profile.json")


if __name__ == "__main__":
    main()
