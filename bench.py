#!/usr/bin/env python
"""Benchmark runner: executes every registered query at SPARK_GRAFT_SF_DIR
(default /root/testdata/sf0.1) on local[SPARK_GRAFT_CPUS] and prints ONE JSON
line: {"metric": ..., "value": total_sec, "unit": "sec", "queries": {...},
"sf": ...}.

Each query is materialized with the noop sink (full execution, no driver
collect). Use BENCH_QUERIES=q1,q2 to restrict, BENCH_REPEAT=n for medians.
"""

from __future__ import annotations

import json
import os
import re
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from nexmark_vanilla_flink_spark.plans import REGISTRY  # noqa: E402
from nexmark_vanilla_flink_spark.session import get_session  # noqa: E402


def main() -> None:
    sf_dir = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
    m = re.search(r"sf([0-9.]+)", sf_dir)
    sf = float(m.group(1)) if m else None
    only = os.environ.get("BENCH_QUERIES")
    names = (
        [n.strip() for n in only.split(",") if n.strip()]
        if only
        else sorted(REGISTRY)
    )
    repeat = int(os.environ.get("BENCH_REPEAT", "1"))

    spark = get_session("nexmark-bench")
    spark.sparkContext.setLogLevel("ERROR")

    # JVM/codegen + noop-sink warmup so the first timed query isn't penalized
    spark.read.parquet(f"{sf_dir}/region.parquet").write.format("noop").mode(
        "overwrite"
    ).save()

    timings: dict[str, float] = {}
    out_rows: dict[str, int] = {}
    for name in names:
        q = REGISTRY[name]
        # warmup run (absorbs codegen/classloading) doubles as the row count
        out_rows[name] = q.spark(spark, sf_dir).count()
        best = None
        for _ in range(repeat):
            t0 = time.perf_counter()
            df = q.spark(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            best = dt if best is None else min(best, dt)
        timings[name] = round(best, 3)

    total = round(sum(timings.values()), 3)
    # input-side throughput: events rows / total nexmark-query time is noisy;
    # report per-query sec plus result rows so rows/s is derivable either way
    print(
        json.dumps(
            {
                "metric": "total_query_wall_time",
                "value": total,
                "unit": "sec",
                "queries": timings,
                "result_rows": out_rows,
                "sf": sf,
            }
        )
    )
    spark.stop()


if __name__ == "__main__":
    main()
