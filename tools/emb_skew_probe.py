#!/usr/bin/env python
"""Scaling probe for the embedding_neardup_pairs oversized-block guard
(VERDICT r4 task 5): build a skewed-label embeddings corpus — one label
holds ~30% of ALL rows and grows linearly with the replication factor K,
the scenario where unguarded within-label pairing explodes quadratically —
and measure candidate-pair counts with and without the guard, plus the
wall time of the real registered query.

Candidates are computed exactly from block sizes (Σ b·(b−1)/2): the
unguarded count uses the raw label blocks; the guarded count uses the
final pairing blocks (small labels directly + (label, seed) sub-blocks
from the SAME deterministic seed-assignment the query and its oracle run,
executed here in DuckDB via the entry's oracle CTEs).

    python tools/emb_skew_probe.py [K ...]    # default 1 4 16
Writes docs/scaling_r5.json.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import duckdb  # noqa: E402

from nexmark_vanilla_flink_spark.plans import REGISTRY  # noqa: E402
from nexmark_vanilla_flink_spark.plans.pipeline import _EMB_BLOCK_CAP  # noqa: E402
from nexmark_vanilla_flink_spark.session import get_session  # noqa: E402
from nexmark_vanilla_flink_spark.sources.tables import TABLE_NAMES  # noqa: E402

BASE = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# the guard's final pairing blocks, straight from the entry's oracle CTE
# shapes: small labels stay whole; big labels split into (label, seed_rank)
_GUARDED_BLOCKS_SQL = f"""
WITH e AS (
  SELECT vec_id, label, CAST(embedding AS DOUBLE[]) AS v FROM embeddings
),
n AS (
  SELECT vec_id, label, v,
         sqrt(list_aggregate(list_transform(v, x -> x * x), 'sum')) AS nrm,
         count(*) OVER (PARTITION BY label) AS bsize,
         row_number() OVER (PARTITION BY label ORDER BY vec_id) AS rn
  FROM e
),
big AS (SELECT * FROM n WHERE bsize > {_EMB_BLOCK_CAP}),
seeds AS (
  SELECT label, rn AS seed_rank, v AS sv, nrm AS snrm
  FROM big
  WHERE rn <= CAST(ceil(bsize / CAST({_EMB_BLOCK_CAP} AS DOUBLE)) AS BIGINT)
),
scored AS (
  SELECT b.label, b.vec_id, s.seed_rank,
         CAST(round(
           list_aggregate(list_transform(list_zip(b.v, s.sv), z -> z[1] * z[2]), 'sum')
           / (b.nrm * s.snrm) * 1000000) AS BIGINT) AS si
  FROM big b JOIN seeds s USING (label)
),
assigned AS (
  SELECT label, vec_id, arg_max(seed_rank, si * 100000 - seed_rank) AS sub
  FROM scored GROUP BY 1, 2
),
blocks AS (
  SELECT CAST(count(*) AS BIGINT) AS b
  FROM n WHERE bsize <= {_EMB_BLOCK_CAP} GROUP BY label
  UNION ALL
  SELECT CAST(count(*) AS BIGINT) FROM assigned GROUP BY label, sub
)
SELECT CAST(sum(b * (b - 1) / 2) AS BIGINT) AS cands,
       CAST(max(b) AS BIGINT) AS max_block,
       count(*) AS n_blocks
FROM blocks
"""

_UNGUARDED_SQL = """
SELECT CAST(sum(b * (b - 1) / 2) AS BIGINT) AS cands, CAST(max(b) AS BIGINT) AS max_block
FROM (SELECT CAST(count(*) AS BIGINT) AS b FROM embeddings GROUP BY label)
"""


def build_skewed_dir(spark, k: int) -> str:
    out = f"/tmp/emb_skew_x{k}"
    done = os.path.join(out, ".done")
    if os.path.exists(done):
        return out
    os.makedirs(out, exist_ok=True)
    for t in TABLE_NAMES:
        if t == "embeddings":
            continue
        dst = f"{out}/{t}.parquet"
        if not os.path.exists(dst):
            os.symlink(f"{BASE}/{t}.parquet", dst)
    emb = spark.read.parquet(f"{BASE}/embeddings.parquet")
    n = emb.count()
    from pyspark.sql import functions as F

    reps = []
    for i in range(k):
        reps.append(
            emb.select(
                (F.col("vec_id") + i * n).alias("vec_id"),
                # ~30% of every replica collapses into ONE global label 0
                # (grows linearly with K); the rest keep per-replica labels
                F.when(F.col("vec_id") % 10 < 3, F.lit(0))
                .otherwise(F.col("label") + 10 * i + 10)
                .cast("int")
                .alias("label"),
                "embedding",
            )
        )
    u = reps[0]
    for r in reps[1:]:
        u = u.unionAll(r)
    u.coalesce(max(1, k // 2)).write.mode("overwrite").parquet(
        f"{out}/embeddings.parquet"
    )
    open(done, "w").close()
    return out


def main() -> None:
    ks = [int(a) for a in sys.argv[1:]] or [1, 4, 16]
    spark = get_session("emb-skew-probe")
    spark.sparkContext.setLogLevel("ERROR")
    results: dict[str, dict] = {}
    for k in ks:
        d = build_skewed_dir(spark, k)
        con = duckdb.connect()
        con.execute(
            f"CREATE VIEW embeddings AS SELECT * FROM read_parquet('{d}/embeddings.parquet/*.parquet')"
        )
        ung = con.execute(_UNGUARDED_SQL).fetchone()
        g = con.execute(_GUARDED_BLOCKS_SQL).fetchone()
        q = REGISTRY["embedding_neardup_pairs"].spark
        t0 = time.monotonic()
        rows = q(spark, d).count()
        wall = round(time.monotonic() - t0, 3)
        # semdedup consumes the SAME guarded pair relation; its extra work
        # (centroid M-step, verdict join) must stay linear under the skew.
        # Aggregate over `kept` (not count()) so the optimizer cannot prune
        # the loser-join subtree out of a bare row count.
        from pyspark.sql import functions as F

        t0 = time.monotonic()
        sd = REGISTRY["semdedup_prune"].spark(spark, d)
        sd_rows = sd.agg(F.sum(sd["kept"].cast("int"))).collect()[0][0]
        sd_wall = round(time.monotonic() - t0, 3)
        results[str(k)] = {
            "semdedup_kept": sd_rows,
            "semdedup_wall_sec": sd_wall,
            "n_vectors": con.execute("SELECT count(*) FROM embeddings").fetchone()[0],
            "unguarded_candidates": ung[0],
            "unguarded_max_block": ung[1],
            "guarded_candidates": g[0],
            "guarded_max_block": g[1],
            "guarded_n_blocks": g[2],
            "result_rows": rows,
            "wall_sec": wall,
        }
        print(k, results[str(k)])
    out = {
        "probe": "embedding_neardup_pairs oversized-block guard",
        "base": BASE,
        "block_cap": _EMB_BLOCK_CAP,
        "skew": "label 0 holds ~30% of all rows at every K",
        "results": results,
    }
    path = os.environ.get("SCALING_OUT", "docs/scaling_r5.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print("wrote", path)


if __name__ == "__main__":
    main()
