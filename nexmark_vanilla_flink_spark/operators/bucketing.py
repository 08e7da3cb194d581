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
    path: str | None = None,
    single_file_per_bucket: bool = False,
) -> None:
    """`path` makes the table external (layout survives the catalog).
    `single_file_per_bucket` pre-partitions on the bucket key so each
    bucket is exactly one file — the prerequisite for the planner to
    *trust* the sortBy order at read time (multi-file buckets would need
    a merge, so Spark re-sorts them below any sort-merge join)."""
    if single_file_per_bucket:
        from pyspark.sql import functions as F

        df = df.repartition(n_buckets, F.col(bucket_col))
    writer = df.write.mode("overwrite").format("parquet").bucketBy(
        n_buckets, bucket_col
    )
    if sort:
        writer = writer.sortBy(bucket_col)
    if path is not None:
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(
    spark: SparkSession, left_table: str, right_table: str, on: str
) -> DataFrame:
    """Join two identically-bucketed tables on their bucket key — planner
    elides both exchanges (verify: no Exchange above the scans)."""
    return spark.table(left_table).join(spark.table(right_table), on)
