"""Streaming execution helpers: bounded replay to an in-memory table
(Trigger.AvailableNow — the Spark twin of the reference's
``isEndOfStream``-bounded Kafka/file replays), latency-tracking sinks
(A7/K1 — NexmarkQuery8.java:245-415's SummaryStatistics CSV sinks), and
``observe()`` metrics (K4 — the Flink Histogram/Gauge surface,
NexmarkQuery8.java:155-217).
"""

from __future__ import annotations

import tempfile
import uuid

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


ROCKSDB_PROVIDER = (
    "org.apache.spark.sql.execution.streaming.state.RocksDBStateStoreProvider"
)


def use_rocksdb_state(spark) -> None:
    """Switch keyed state to the RocksDB provider (the reference's state
    backend, NexmarkSuite.java:57) — spill-to-disk state for 100 TB streams;
    the default in-memory provider is faster for small local replays."""
    spark.conf.set("spark.sql.streaming.stateStore.providerClass", ROCKSDB_PROVIDER)
    spark.conf.set(
        "spark.sql.streaming.stateStore.rocksdb.changelogCheckpointing.enabled",
        "true",
    )


def run_available_now(
    sdf: DataFrame,
    output_mode: str = "append",
    timeout_s: int = 300,
    name: str | None = None,
    checkpoint_dir: str | None = None,
) -> DataFrame:
    """Run a streaming DataFrame to completion on the currently-available
    data and return the result as a (batch) DataFrame from the memory sink.

    Pass ``checkpoint_dir`` to resume from (or establish) a durable
    checkpoint — restarting with the same dir continues exactly-once from
    the recorded offsets.
    """
    spark = sdf.sparkSession
    qname = name or f"q_{uuid.uuid4().hex[:8]}"
    ckpt = checkpoint_dir or tempfile.mkdtemp(prefix=f"ckpt_{qname}_")
    q = (
        sdf.writeStream.format("memory")
        .queryName(qname)
        .outputMode(output_mode)
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    if q.isActive:
        q.stop()
        raise TimeoutError(f"streaming query {qname} did not finish in {timeout_s}s")
    if q.exception() is not None:
        raise q.exception()
    return spark.table(qname)


def latency_stats_sink(
    sdf: DataFrame,
    ts_col: str,
    out_dir: str,
    trigger_seconds: int | None = None,
):
    """foreachBatch latency tracker [A7/K1]: per micro-batch, compute
    count/mean/min/max of (now − event_time) and append one CSV row —
    the declarative twin of the reference's per-subtask buffered CSV sinks
    (NexmarkQuery8.java:271-414). Outliers beyond 10 min are dropped, as in
    NexmarkQuery8.java:382-396."""

    def _batch(df: DataFrame, batch_id: int) -> None:
        lat = df.select(
            (
                F.unix_micros(F.current_timestamp()) - F.unix_micros(F.col(ts_col))
            ).alias("lat_us")
        ).filter(F.col("lat_us") < 600 * 1_000_000)
        stats = lat.agg(
            F.lit(batch_id).alias("batch_id"),
            F.count(F.lit(1)).alias("n"),
            F.avg("lat_us").alias("mean_us"),
            F.min("lat_us").alias("min_us"),
            F.max("lat_us").alias("max_us"),
        )
        stats.write.mode("append").csv(out_dir)

    writer = sdf.writeStream.foreachBatch(_batch).outputMode("append")
    if trigger_seconds:
        writer = writer.trigger(processingTime=f"{trigger_seconds} seconds")
    else:
        writer = writer.trigger(availableNow=True)
    return writer.start()


def with_observed_metrics(sdf: DataFrame, name: str = "nexmark_metrics") -> DataFrame:
    """Attach named streaming metrics (count + value stats) — read them from
    StreamingQueryProgress.observedMetrics, the K4 Gauge/Histogram twin."""
    return sdf.observe(
        name,
        F.count(F.lit(1)).alias("n_rows"),
    )


def run_noop(sdf: DataFrame, timeout_s: int = 300):
    """Discard sink (K3 — NexmarkQuery8.java:723-728, cm/CM.java:304-312)."""
    ckpt = tempfile.mkdtemp(prefix="ckpt_noop_")
    q = (
        sdf.writeStream.format("noop")
        .option("checkpointLocation", ckpt)
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(timeout_s)
    return q
