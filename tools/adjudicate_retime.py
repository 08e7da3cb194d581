#!/usr/bin/env python
"""Isolated min-of-N adjudication retimes (VERDICT r9 task 5): for the
>2x-vs-oracle batch entries whose gap is argued to be Spark stage-floor at
tiny SF, record an ISOLATED quiet-box measurement at sf0.1 AND the 10x
replica — Spark min-of-3 (lazy discipline: construction outside, one
untimed warmup save) against DuckDB oracle min-of-2 warm — so the
per-entry "the ratio shrinks with scale" adjudication in SCALE_NOTES cites
a recorded artifact instead of an in-sweep sample.

    python tools/adjudicate_retime.py [OUT_JSON] [SF_DIR ...]

Defaults: docs/adjudication_r10.json, sf0.1 relayout dir + /tmp/sf1.0.
Entries via ADJ_QUERIES (comma list) or the built-in cohort.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexmark_vanilla_flink_spark.plans import REGISTRY  # noqa: E402
from nexmark_vanilla_flink_spark.plans.registry import EAGER_TAGS  # noqa: E402
from nexmark_vanilla_flink_spark.sources.tables import TABLE_NAMES  # noqa: E402

COHORT = [
    "copurchase_kcore",
    "kmeans_train",
    "semdedup_prune",
    "entity_resolution_pairs",
    "winnow_overlap_pairs",
    "tfidf_cosine_topk",
    "quality_label_propagation",
    "ngram_containment_pairs",
    "cosine_topk_bruteforce",
]


def main() -> None:
    out_path = sys.argv[1] if len(sys.argv) > 1 else os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "docs",
        "adjudication_r10.json",
    )
    sf_dirs = sys.argv[2:] or ["/tmp/bench_relayout_rel_sf0.1", "/tmp/sf1.0"]
    names = [
        n
        for n in (os.environ.get("ADJ_QUERIES", "").split(",") or [])
        if n in REGISTRY
    ] or COHORT

    import duckdb

    from nexmark_vanilla_flink_spark.session import get_session

    os.environ.setdefault("SPARK_DRIVER_MEM", "24g")
    spark = get_session("adjudicate")
    spark.sparkContext.setLogLevel("ERROR")
    spark.conf.set("spark.sql.shuffle.partitions", "8")

    from nexmark_vanilla_flink_spark.operators.artifacts import (
        ARTIFACT_BUILDERS,
        pop_build_log,
    )

    result: dict = {"entries": {}}
    for sf_dir in sf_dirs:
        spark.read.parquet(f"{sf_dir}/region.parquet").write.format(
            "noop"
        ).mode("overwrite").save()
        for fn in ARTIFACT_BUILDERS.values():
            fn(spark, sf_dir)
        spark.catalog.clearCache()
        pop_build_log()
        # per-session floor, same probe as bench.py
        fl = spark.range(1)
        for _ in range(3):
            fl.write.format("noop").mode("overwrite").save()
        floor = None
        for _ in range(5):
            t0 = time.perf_counter()
            fl.write.format("noop").mode("overwrite").save()
            dt = time.perf_counter() - t0
            floor = dt if floor is None else min(floor, dt)

        con = duckdb.connect()
        con.execute(f"SET threads TO {os.environ.get('SPARK_GRAFT_CPUS', '32')}")
        for t in TABLE_NAMES:
            p = f"{sf_dir}/{t}.parquet"
            src = f"{p}/*.parquet" if os.path.isdir(p) else p
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{src}')")
        for name in names:
            q = REGISTRY[name]
            eager = bool(EAGER_TAGS & set(q.tags))
            spark_s = None
            if eager:
                for _ in range(3):
                    t0 = time.perf_counter()
                    q.spark(spark, sf_dir).write.format("noop").mode(
                        "overwrite"
                    ).save()
                    dt = time.perf_counter() - t0
                    spark_s = dt if spark_s is None else min(spark_s, dt)
                    spark.catalog.clearCache()
            else:
                df = q.spark(spark, sf_dir)
                df.write.format("noop").mode("overwrite").save()
                spark.catalog.clearCache()
                for _ in range(3):
                    t0 = time.perf_counter()
                    df.write.format("noop").mode("overwrite").save()
                    dt = time.perf_counter() - t0
                    spark_s = dt if spark_s is None else min(spark_s, dt)
                    spark.catalog.clearCache()
            duck_s = None
            if q.oracle:
                con.execute(q.oracle).fetchall()
                for _ in range(2):
                    t0 = time.perf_counter()
                    con.execute(q.oracle).fetchall()
                    dt = time.perf_counter() - t0
                    duck_s = dt if duck_s is None else min(duck_s, dt)
            rec = result["entries"].setdefault(name, {})
            net = max(spark_s - floor, 0.0)
            rec[sf_dir] = {
                "spark_s": round(spark_s, 3),
                "duck_s": round(duck_s, 3) if duck_s else None,
                "floor_s": round(floor, 3),
                "net_ratio": round(net / duck_s, 2) if duck_s else None,
            }
            print(name, sf_dir, rec[sf_dir], flush=True)
            with open(out_path, "w") as f:
                json.dump(result, f, indent=1)
        con.close()
    print(f"wrote {out_path}")
    spark.stop()


if __name__ == "__main__":
    main()
