"""Streaming exact dedup (north-star: dropDuplicatesWithinWatermark): replay
the events file twice — the second copy must be fully suppressed while the
duplicates arrive within the watermark."""

import shutil
import tempfile

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.sources.tables import load_table


def test_drop_duplicates_within_watermark(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    n_distinct = ev.select("event_id").distinct().count()
    with tempfile.TemporaryDirectory(prefix="dup_") as d:
        src = f"{d}/in"
        # two identical files → every event arrives twice
        ev.select("event_id", "ts", "user_id").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        ev.select("event_id", "ts", "user_id").coalesce(1).write.mode(
            "append"
        ).parquet(src)
        schema = "event_id long, ts timestamp, user_id long"
        sdf = spark.readStream.schema(schema).parquet(src)
        deduped = sdf.withWatermark("ts", "10 minutes").dropDuplicatesWithinWatermark(
            ["event_id"]
        )
        q = (
            deduped.writeStream.format("memory")
            .queryName("dedup_stream")
            .outputMode("append")
            .option("checkpointLocation", f"{d}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        assert spark.table("dedup_stream").count() == n_distinct
