#!/usr/bin/env python
"""Measure how the corpus-scale operators behave as the documents table
grows: replicate the sf0.1 documents table K× with per-replica token
prefixes (every word becomes ``r<k><word>``), so

  * each replica keeps the EXACT intra-replica duplicate/near-duplicate
    structure of the original corpus (same shingle collisions, same dup
    cliques, shifted into a disjoint vocabulary), and
  * no shingle/bigram/chunk ever matches across replicas — result sizes and
    candidate-pair counts grow LINEARLY in K by construction.

A sub-quadratic operator (banded LSH, digest grouping, broadcast
decontamination) must therefore show ~linear wall time in K; anything
all-pairs would go quadratic. Results land in the JSON file given by
SCALING_OUT (default /tmp/scaling_curve.json) and are summarized in
SCALE_NOTES.md.

    python tools/scaling_curve.py [K ...]     # default 1 4 16
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from nexmark_vanilla_flink_spark.plans import REGISTRY  # noqa: E402
from nexmark_vanilla_flink_spark.session import get_session  # noqa: E402
from nexmark_vanilla_flink_spark.sources.tables import TABLE_NAMES  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

QUERIES = [
    "dedup_exact_docs",
    "minhash_lsh_pairs",
    "simhash_neardup_pairs",
    "chunk_dedup_stats",
    "eval_decontamination",
    "doc_bigram_rarity",
    "dedup_clusters",
    "corpus_curation",
    "ngram_containment_pairs",
    # r4 additions / changed plans
    "pii_scrub",  # scan-only: must scale ~linearly with zero shuffle
    "incremental_dedup",  # new-vs-corpus joins (de-broadcast path at scale)
    "text_normalize_fingerprints",
    "minhash_estimate_error",  # candidate-bounded exact-Jaccard telemetry
    # r5 changed plans
    "doc_top_terms",  # per-row run-length tf: must scale ~linearly
    # r5 additions
    "dedup_cluster_rewrite",  # CC + provenance agg: linear in docs+edges
]


def build_scaled_dir(spark, k: int) -> str:
    """K× documents with disjoint per-replica vocabularies; other tables
    symlinked from the base SF dir."""
    out = f"/tmp/scaling_x{k}"
    done = os.path.join(out, ".done")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLE_NAMES:
        if t == "documents":
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    docs = spark.read.parquet(f"{BASE}/documents.parquet")
    n = docs.count()
    from pyspark.sql import functions as F

    reps = None
    for i in range(k):
        r = docs.select(
            (F.col("doc_id") + i * n).alias("doc_id"),
            # prefix EVERY token with the replica tag: intra-replica shingle
            # structure is preserved exactly, cross-replica matches are zero
            F.regexp_replace("text", r"(^|\ )", f"$1r{i}").alias("text"),
            "lang",
            "source",
            "n_chars",
        )
        reps = r if reps is None else reps.unionByName(r)
    # ~16 files per replica so scan parallelism grows with the data, the
    # way a real 100 TB table's split count would
    reps.repartition(max(16, 4 * k)).write.mode("overwrite").parquet(
        f"{out}/documents.parquet"
    )
    open(done, "w").close()
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("scaling-curve")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict[str, float | int]] = {}
    rows: dict[str, dict[str, int]] = {}
    for k in ks:
        sf_dir = build_scaled_dir(spark, k)
        results[str(k)] = {}
        rows[str(k)] = {}
        for name in QUERIES:
            q = REGISTRY[name]
            rows[str(k)][name] = q.spark(spark, sf_dir).count()  # warm
            best = None
            for _ in range(2):
                t0 = time.perf_counter()
                q.spark(spark, sf_dir).write.format("noop").mode(
                    "overwrite"
                ).save()
                dt = time.perf_counter() - t0
                best = dt if best is None else min(best, dt)
            results[str(k)][name] = round(best, 3)
            print(f"x{k} {name}: {results[str(k)][name]} s "
                  f"({rows[str(k)][name]} rows)", flush=True)
    out = {"base": BASE, "timings_sec": results, "result_rows": rows}
    path = os.environ.get("SCALING_OUT", "/tmp/scaling_curve.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
