"""Bucketed co-located joins — the pre-shuffle answer to repeated fact-fact
joins. Writing both tables bucketed (and sorted) by the join key means every
subsequent join on that key is exchange-free: each task sort-merges bucket i
of both sides locally. At 100 TB this converts the nightly lineitem⋈orders
shuffle into a one-time layout cost at ingest.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_col: str,
    n_buckets: int = 8,
    sort: bool = True,
) -> None:
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planner
    elides both exchanges (verify: no Exchange above the scans)."""
    return spark.table(left_table).join(spark.table(right_table), on)
