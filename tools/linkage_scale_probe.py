"""Scaling probe for entity_resolution_pairs: replicate the customer
registry K× (fresh entity keys/names/balances — the realistic growth mode:
more ENTITIES, not more copies of one entity) and measure candidate counts
and wall for pass 1 (reliable-attribute blocking), pass 2 capped vs
uncapped, and the final pair output.

The claim under test (plans/linkage.py docstring): pass-1 candidates grow
LINEARLY with the corpus (block size = duplicates-per-entity, a constant),
and pass-2 candidates are bounded by cap * n_blocks even though raw pass-2
block sizes grow with data.

Usage: python tools/linkage_scale_probe.py  →  docs/scaling_r5_linkage.json
"""

import json
import sys
import time

sys.path.insert(0, "/root/repo")

from pyspark.sql import SparkSession, Window
from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.plans.linkage import (
    _ER_BLOCK_CAP,
    _ER_LEV_MAX,
    _er_sides_from,
)
from nexmark_vanilla_flink_spark.sources.tables import load_table

BASE = "/root/testdata/sf0.1"


def scaled_customer(spark, k: int):
    cust = load_table(spark, BASE, "customer").select(
        "c_custkey", "c_name", "c_nationkey", "c_acctbal", "c_mktsegment"
    )
    n = cust.agg(F.max("c_custkey")).collect()[0][0] + 1
    reps = spark.range(k).withColumnRenamed("id", "rep")
    return (
        cust.crossJoin(reps)
        .select(
            (F.col("c_custkey") + F.col("rep") * n).alias("c_custkey"),
            F.concat(
                F.lit("Customer#"),
                F.lpad(
                    (F.col("c_custkey") + F.col("rep") * n).cast("string"),
                    9,
                    "0",
                ),
            ).alias("c_name"),
            "c_nationkey",
            # fresh entities carry fresh balances (deterministic jitter in
            # cents) — replicated IDENTICAL balances would be the
            # duplicate-entity mode, which pass 1 exists to catch
            F.round(
                F.col("c_acctbal") + (F.col("rep") * 7.13) % 100.0, 2
            ).alias("c_acctbal"),
            "c_mktsegment",
        )
        .repartition(32)
    )


def probe(spark, k: int) -> dict:
    a, b = _er_sides_from(scaled_customer(spark, k))
    p1 = a.join(
        b,
        (F.col("a_nationkey") == F.col("b_nationkey"))
        & (F.col("a_cents") == F.col("b_cents")),
    ).select("a_key", "b_key", "a_name", "b_name")
    bw = Window.partitionBy("b_segment", F.expr("substr(b_name, -3, 3)"))
    bn = b.withColumn("blk_n", F.count(F.lit(1)).over(bw))
    blk_stats = bn.agg(
        F.max("blk_n").alias("max_blk"),
        F.count_distinct("b_segment", F.expr("substr(b_name, -3, 3)")).alias(
            "n_blocks"
        ),
    ).collect()[0]
    b2 = bn.filter(F.col("blk_n") <= _ER_BLOCK_CAP)
    p2_join = lambda side: a.join(  # noqa: E731
        side,
        (F.col("a_segment") == F.col("b_segment"))
        & (F.expr("substr(a_name, -3, 3)") == F.expr("substr(b_name, -3, 3)")),
    ).select("a_key", "b_key", "a_name", "b_name")
    n_p1 = p1.count()
    n_p2_capped = p2_join(b2).count()
    n_p2_uncapped = p2_join(bn).count()
    cand = p1.unionByName(p2_join(b2)).distinct()
    lev = F.levenshtein("a_name", "b_name")
    t0 = time.monotonic()
    out = cand.filter(lev <= _ER_LEV_MAX).select("a_key", "b_key")
    # force full plan: aggregate a computed column (a bare count lets
    # Catalyst prune the distinct/lev work)
    n_out = out.agg(F.sum((F.col("a_key") % 2).cast("int"))).collect()
    wall = time.monotonic() - t0
    n_pairs = cand.filter(lev <= _ER_LEV_MAX).count()
    return {
        "n_customers": 15_000 * k,
        "pass1_candidates": n_p1,
        "pass2_candidates_capped": n_p2_capped,
        "pass2_candidates_uncapped": n_p2_uncapped,
        "pass2_max_block": int(blk_stats["max_blk"]),
        "pass2_n_blocks": int(blk_stats["n_blocks"]),
        "result_pairs": n_pairs,
        "final_stage_wall_sec": round(wall, 3),
        "_sum_probe": int(n_out[0][0] or 0),
    }


def main():
    spark = (
        SparkSession.builder.master("local[16]")
        .config("spark.sql.shuffle.partitions", "32")
        .getOrCreate()
    )
    spark.sparkContext.setLogLevel("ERROR")
    results = {}
    for k in (1, 4, 16):
        t0 = time.monotonic()
        results[str(k)] = probe(spark, k)
        results[str(k)]["wall_sec"] = round(time.monotonic() - t0, 3)
        print(k, results[str(k)], flush=True)
    doc = {
        "probe": "entity_resolution_pairs blocking growth",
        "base": BASE,
        "block_cap": _ER_BLOCK_CAP,
        "growth_mode": "fresh entities (replicated registry, fresh keys/names/balances)",
        "results": results,
    }
    with open("/root/repo/docs/scaling_r5_linkage.json", "w") as f:
        json.dump(doc, f, indent=1)


if __name__ == "__main__":
    main()
