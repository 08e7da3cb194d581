"""Parallelism guard for CPU-dense per-row operators (hash chains, vector
math). A small parquet file scans as one partition, serializing the whole
computation; at 100 TB the scan has thousands of splits and this is a no-op.
Only repartition when the source is under-split — the round-robin shuffle of
the (small) under-split input is far cheaper than running single-threaded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    # Probe split count from the file listing, NOT df.rdd.getNumPartitions():
    # the RDD conversion forces full physical planning plus a Python<->JVM hop
    # at plan-build time, which is per-query constant overhead and defeats lazy
    # plan construction. inputFiles() undercounts splits for one giant file
    # (maxPartitionBytes would split it further); the worst case is then one
    # redundant round-robin shuffle of an input that was already parallel
    # enough, which is cheap relative to running a CPU-dense stage serialized.
    spark = df.sparkSession
    target = int(spark.sparkContext.defaultParallelism * min_factor)
    try:
        n_files = len(df.inputFiles())
    except Exception:
        n_files = 0
    if n_files >= target:
        return df
    return df.repartition(target)
