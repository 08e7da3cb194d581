"""True incremental processing: split the events table into many files and
replay with maxFilesPerTrigger=1 — the watermark advances batch by batch,
state accumulates across micro-batches, and the final result must still
equal the batch plan. Also: the streaming left-outer join emits null-extended
rows once the watermark closes a window."""

import tempfile

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.plans.nexmark import q5_hot_items
from nexmark_vanilla_flink_spark.sources.tables import load_table, nexmark_streams


def test_multi_microbatch_incremental_equals_batch(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    with tempfile.TemporaryDirectory(prefix="inc_") as d:
        src = f"{d}/in"
        # 8 chunks ordered by time → 8 micro-batches, watermark climbs per batch
        ev.select("event_id", "ts_ns", "event_type", "value", "props").orderBy(
            "ts_ns"
        ).repartitionByRange(8, "ts_ns").write.parquet(src)
        schema = "event_id long, ts_ns long, event_type string, value double, props string"
        sdf = (
            spark.readStream.schema(schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(src)
            .withColumn("ts", F.timestamp_micros(F.expr("ts_ns DIV 1000")))
            .withColumn(
                "k", F.regexp_extract("props", r":\s*([0-9]+)", 1).cast("long")
            )
        )
        bids = sdf.filter(F.col("event_type") == "purchase").select(
            F.col("k").alias("item_id"),
            F.col("value").alias("bid"),
            F.col("ts").alias("b_ts"),
            F.col("ts_ns").alias("b_ts_ns"),
        )
        agg = (
            bids.withWatermark("b_ts", "2 seconds")
            .groupBy(
                F.window("b_ts", "1 hour").alias("w"),
                F.col("item_id").alias("auction_id"),
            )
            .agg(
                F.max("bid").alias("max_bid"),
                F.count(F.lit(1)).alias("bid_count"),
                F.expr("CAST(max(b_ts_ns) DIV 1000000000 AS BIGINT)").alias(
                    "last_bid_ts_s"
                ),
            )
            .select(
                "auction_id",
                F.col("w.start").cast("long").alias("w_start_s"),
                "max_bid",
                "bid_count",
                "last_bid_ts_s",
            )
        )
        q = (
            agg.writeStream.format("memory")
            .queryName("inc_q5")
            .outputMode("complete")
            .option("checkpointLocation", f"{d}/ck")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        if q.exception() is not None:
            raise q.exception()
        # ≥ 8 micro-batches ran (one per file)
        assert q.lastProgress["batchId"] >= 7, q.lastProgress["batchId"]
        got = sorted(map(tuple, spark.table("inc_q5").collect()))
        want = sorted(
            map(
                tuple,
                q5_hot_items(spark, sf_dir)
                .select(
                    "auction_id", "w_start_s", "max_bid", "bid_count", "last_bid_ts_s"
                )
                .collect(),
            )
        )
        assert got == want


def test_stream_stream_left_outer_join_emits_nulls(spark, sf_dir):
    """Left-outer stream-stream join: persons with no auctions in their
    window must appear with nulls once the watermark closes the window.
    Bounded replay can't close the final windows, so assert (a) every inner
    row present, (b) null-extended rows exist, (c) no spurious matches."""
    from nexmark_vanilla_flink_spark.streaming.sources import stream_nexmark

    s = stream_nexmark(spark, sf_dir)
    p = s["persons"].withWatermark("p_ts", "2 seconds").withColumn(
        "w", F.window("p_ts", "1 day")
    )
    a = (
        s["auctions"]
        .withWatermark("start_ts", "2 seconds")
        .withColumn("w", F.window("start_ts", "1 day"))
        .withColumnRenamed("seller_id", "user_id")
        .select("user_id", "w", "auction_id")
    )
    joined = p.join(a, ["user_id", "w"], "left_outer").select(
        "person_id", "user_id", F.col("w.start").cast("long").alias("w_start_s"), "auction_id"
    )
    from nexmark_vanilla_flink_spark.streaming.runner import run_available_now

    out = run_available_now(joined, output_mode="append", name="louter")
    rows = out.collect()
    inner = {
        (r["person_id"], r["auction_id"])
        for r in rows
        if r["auction_id"] is not None
    }
    nulls = [r for r in rows if r["auction_id"] is None]
    # batch reference
    b = nexmark_streams(spark, sf_dir)
    bp = b["persons"].withColumn(
        "w_start_s", F.expr("CAST(p_ts_ns DIV 86400000000000 AS BIGINT) * 86400")
    )
    ba = (
        b["auctions"]
        .withColumn(
            "w_start_s",
            F.expr("CAST(start_ts_ns DIV 86400000000000 AS BIGINT) * 86400"),
        )
        .withColumnRenamed("seller_id", "user_id")
        .select("user_id", "w_start_s", "auction_id")
    )
    batch_inner = {
        (r["person_id"], r["auction_id"])
        for r in bp.join(ba, ["user_id", "w_start_s"]).collect()
    }
    assert inner == batch_inner, "streaming inner rows differ from batch"
    assert nulls, "no null-extended rows emitted — outer side never fired"
    # every null-extended person must truly have no auctions in their window
    batch_matched_persons = {p_ for p_, _ in batch_inner}
    for r in nulls:
        assert r["person_id"] not in batch_matched_persons, r
