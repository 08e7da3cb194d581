"""Iterative graph operators — the one algorithm class that is a *loop* of
DataFrame jobs rather than a single plan. Used for duplicate-cluster
formation: MinHash-LSH emits candidate pairs; connected components turns
pairs into dedup groups (every doc keeps the smallest doc_id of its cluster).

Scale notes: each iteration is one shuffle (join on the edge key) and the
label frame is checkpointed per iteration to cut lineage — without that,
iteration k replays all k-1 previous joins. Convergence is detected with a
single scalar aggregate (sum of labels, strictly decreasing until fixpoint),
so the driver never collects the data itself. Cluster diameter bounds the
iteration count; near-dup clusters are tiny, so this converges in 2-4 rounds.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def _union_find_labels(edge_rows) -> dict:
    """Driver-side union-find with path compression; returns {vertex: min
    reachable vertex}. Only ever fed a bounded number of edges."""
    parent: dict = {}

    def find(x):
        r = x
        while parent.setdefault(r, r) != r:
            r = parent[r]
        while parent[x] != r:
            parent[x], x = r, parent[x]
        return r

    for a, b in edge_rows:
        ra, rb = find(a), find(b)
        if ra != rb:
            # union by min so the root IS the cluster id
            lo, hi = (ra, rb) if ra < rb else (rb, ra)
            parent[hi] = lo
    return {v: find(v) for v in parent}


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
    driver_max_edges: int = 1_000_000,
) -> DataFrame:
    """Min-label propagation: returns (id, cluster_id) where cluster_id is
    the smallest vertex id reachable from id (undirected edges).

    Adaptive execution: after LSH candidate generation the edge set is tiny
    relative to the corpus (near-dup pairs, not documents). When it fits the
    ``driver_max_edges`` bound, ONE bounded collect + union-find on the
    driver replaces k distributed rounds — each distributed round costs two
    joins' worth of stage barriers, which dwarfs the actual work on a small
    graph (measured at sf0.1: 0.5-0.75 s per round for a 524-edge frame).
    The label map goes back as a broadcast join onto the vertex frame. Above
    the bound, the distributed min-label loop below handles graphs of any
    size — same contract, same results (both paths emit exactly the
    ``vertices`` set: labels are semi-joined back against it)."""
    # Evaluation-count design (measured at sf0.1, LSH upstream ~1.8 s to
    # materialize vs ~0.9 s for a truncated CollectLimit pass):
    #   small graph (the common case): ONE truncated CollectLimit pass of
    #     the raw edge DAG — checkpoint-first would pay full
    #     materialization (+1 s per call) to save nothing;
    #   large graph: the truncated probe, then ONE checkpoint of the raw
    #     frame; the symmetrizing union and every loop iteration read the
    #     checkpoint instead of re-deriving the upstream (the r2 shape
    #     derived it once per union branch — 3 evaluations total).
    raw = edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
    # union-find treats edges as undirected, so the probe needs no
    # symmetrization
    _fastpath_probe = raw.limit(driver_max_edges + 1).collect()
    if len(_fastpath_probe) <= driver_max_edges:
        label_map = _union_find_labels((r[0], r[1]) for r in _fastpath_probe)
        spark = vertices.sparkSession
        if not label_map:
            return vertices.select(
                F.col(vertex_col).alias("id"),
                F.col(vertex_col).alias("cluster_id"),
            )
        labels_df = spark.createDataFrame(
            list(label_map.items()), ["id", "root"]
        )
        from pyspark.sql.functions import broadcast

        return vertices.select(F.col(vertex_col).alias("id")).join(
            broadcast(labels_df), "id", "left"
        ).select(
            "id", F.coalesce(F.col("root"), F.col("id")).alias("cluster_id")
        )

    # Distributed path: materialize the raw edges once, then symmetrize off
    # the checkpoint (a cheap double read of materialized rows, not a
    # double derivation of the upstream DAG).
    raw = raw.localCheckpoint()
    sym = raw.unionByName(
        raw.select(F.col("dst").alias("src"), F.col("src").alias("dst"))
    )
    # Only edge ENDPOINTS can ever change label — isolated vertices keep
    # their own id by definition, so they stay out of the loop entirely and
    # are unioned back at the end. On a near-dup graph this shrinks the
    # iterated frame from |corpus| to |docs with any candidate pair|
    # (typically a few % at curation thresholds).
    endpoints = sym.select(F.col("src").alias("id")).distinct()
    labels = endpoints.select("id", F.col("id").alias("label")).localCheckpoint()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
    prev_frame = labels
    for _ in range(max_iter):
        neighbor_min = (
            sym.join(labels, sym.dst == labels.id)
            .groupBy("src")
            .agg(F.min("label").alias("nbr_label"))
        )
        labels = (
            labels.join(neighbor_min, labels.id == neighbor_min.src, "left")
            .select(
                "id",
                F.least(
                    F.col("label"), F.coalesce(F.col("nbr_label"), F.col("label"))
                ).alias("label"),
            )
            .persist()
        )
        # ONE action per iteration: the convergence aggregate materializes
        # the persisted frame as a side effect (the earlier eager-checkpoint
        # + separate collect shape ran two jobs per round)
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        prev_frame.unpersist()
        prev_frame = labels
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    isolated = vertices.select(F.col(vertex_col).alias("id")).join(
        endpoints, "id", "left_anti"
    )
    # semi-join the endpoint labels back against `vertices` so the output is
    # exactly the vertex set on BOTH paths — without it, edges referencing
    # vertices outside `vertices` would leak extra rows here but not in the
    # driver fast path
    out = (
        labels.select("id", F.col("label").alias("cluster_id"))
        .join(
            vertices.select(F.col(vertex_col).alias("id")), "id", "left_semi"
        )
        .unionByName(isolated.select("id", F.col("id").alias("cluster_id")))
    )
    # hand the caller a plan that no longer pins the persisted iteration
    # frame (bench runs sweep hundreds of these)
    out = out.localCheckpoint()
    prev_frame.unpersist()
    return out
