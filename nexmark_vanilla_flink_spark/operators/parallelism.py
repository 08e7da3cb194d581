"""Parallelism guard for CPU-dense per-row operators (hash chains, vector
math). A small parquet file scans as one partition, serializing the whole
computation; at 100 TB the scan has thousands of splits and this is a no-op.
Only repartition when the source is under-split — the round-robin shuffle of
the (small) under-split input is far cheaper than running single-threaded.
"""

from __future__ import annotations

from pyspark.sql import DataFrame


def ensure_parallelism(df: DataFrame, min_factor: float = 1.0) -> DataFrame:
    spark = df.sparkSession
    target = int(spark.sparkContext.defaultParallelism * min_factor)
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df
