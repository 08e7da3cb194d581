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


def connected_components(
    vertices: DataFrame,
    edges: DataFrame,
    vertex_col: str = "id",
    src_col: str = "src",
    dst_col: str = "dst",
    max_iter: int = 20,
) -> DataFrame:
    """Min-label propagation: returns (id, cluster_id) where cluster_id is
    the smallest vertex id reachable from id (undirected edges)."""
    sym = (
        edges.select(F.col(src_col).alias("src"), F.col(dst_col).alias("dst"))
        .unionByName(
            edges.select(F.col(dst_col).alias("src"), F.col(src_col).alias("dst"))
        )
        # Materialize the edge frame ONCE. For dedup_clusters the upstream DAG
        # is the full MinHash-LSH candidate pipeline (shingle -> minhash ->
        # band self-join); without this checkpoint every iteration (and both
        # convergence collects) replays that DAG from the parquet scan, which
        # multiplies the most expensive stage by the iteration count at scale.
        .localCheckpoint()
    )
    labels = vertices.select(
        F.col(vertex_col).alias("id"), F.col(vertex_col).alias("label")
    ).localCheckpoint()
    prev_sum = labels.agg(F.sum("label")).collect()[0][0]
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
            .localCheckpoint()  # cut lineage: keep each iteration one job deep
        )
        cur_sum = labels.agg(F.sum("label")).collect()[0][0]
        if cur_sum == prev_sum:
            break
        prev_sum = cur_sum
    return labels.select("id", F.col("label").alias("cluster_id"))
