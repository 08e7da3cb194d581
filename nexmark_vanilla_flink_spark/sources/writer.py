"""Generator pipeline sinks — the Spark twin of the reference's generator job
(S4/K2: generator/GeneratorPipeline.java:93-252 — synthetic interleaved
events produced into Kafka with a murmur3-on-key partitioner).

``events_to_parquet`` is the file-backed variant used for soak tests and for
producing replayable fixtures; ``events_to_kafka_json`` mirrors the Kafka
producer (key-partitioned by the event's key, JSON payload) and requires the
spark-sql-kafka connector on a real deployment.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def events_to_parquet(
    events: DataFrame, path: str, partition_cols: tuple[str, ...] = ("event_type",)
) -> None:
    """Write a (batch) generated event table as partitioned parquet — the
    replayable-fixture path. Partitioning by event type mirrors the
    per-stream Kafka topics (NexmarkCommon.java:5-7): downstream per-stream
    readers prune to their partition."""
    events.write.mode("overwrite").partitionBy(*partition_cols).parquet(path)


def event_json_payload(events: DataFrame) -> DataFrame:
    """(key, value) rows ready for a Kafka sink: key = the record's hot-key
    (partitioning key, the producer's murmur3 input —
    GeneratorPipeline.java:198-252), value = JSON payload."""
    return events.select(
        F.col("ref_person_id").cast("string").alias("key"),
        F.to_json(
            F.struct(
                "event_id", "event_type", "ts_ns", "person_id",
                "ref_person_id", "ref_auction_id", "price",
            )
        ).alias("value"),
    )


def events_to_kafka_json(
    events: DataFrame, bootstrap_servers: str, topic: str = "nexmark-events"
):
    """Streaming Kafka producer (K2). Connector-gated: needs
    spark-sql-kafka-0-10 on the classpath (not in this container)."""
    return (
        event_json_payload(events)
        .writeStream.format("kafka")
        .option("kafka.bootstrap.servers", bootstrap_servers)
        .option("topic", topic)
        .start()
    )


def compact_parquet(
    df, path: str, target_rows_per_file: int = 1_000_000, partition_cols: tuple = ()
) -> None:
    """Small-files compaction — the 100 TB hygiene pass: rewrite a dataset
    into files of ~target_rows_per_file (AQE-coalesced partitions +
    maxRecordsPerFile cap). A day of streaming micro-batch output produces
    thousands of small files; scans over them pay per-file open cost and
    planning overhead until compacted."""
    n = df.count()
    n_parts = max(1, (n + target_rows_per_file - 1) // target_rows_per_file)
    writer = (
        df.repartition(n_parts)
        .write.mode("overwrite")
        .option("maxRecordsPerFile", target_rows_per_file)
    )
    if partition_cols:
        writer = writer.partitionBy(*partition_cols)
    writer.parquet(path)


def decode_event_json(kv) -> "DataFrame":
    """Inverse of ``event_json_payload``: parse the (key, value) JSON rows
    back into typed generator-event columns — the consumer half of the
    Kafka contract (S6 decode), usable on any DataFrame with a ``value``
    string column (Kafka source or test fixture)."""
    from pyspark.sql import functions as F
    from pyspark.sql.types import (
        DoubleType,
        IntegerType,
        LongType,
        StructField,
        StructType,
    )

    schema = StructType(
        [
            StructField("event_id", LongType()),
            StructField("event_type", IntegerType()),
            StructField("ts_ns", LongType()),
            StructField("person_id", LongType()),
            StructField("ref_person_id", LongType()),
            StructField("ref_auction_id", LongType()),
            StructField("price", DoubleType()),
        ]
    )
    parsed = kv.select(F.from_json(F.col("value"), schema).alias("e"))
    return parsed.select("e.*").withColumn(
        "ts", F.timestamp_micros(F.expr("ts_ns DIV 1000"))
    )
