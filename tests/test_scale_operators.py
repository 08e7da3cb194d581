"""Scale-path operators: salted join equivalence, checkpoint recovery,
generator→parquet round trip, RocksDB state provider."""

import tempfile

import pytest

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.operators.skew import salted_join
from nexmark_vanilla_flink_spark.sources.generator import (
    generate_events_batch,
    split_streams,
)
from nexmark_vanilla_flink_spark.sources.tables import nexmark_streams
from nexmark_vanilla_flink_spark.sources.writer import (
    event_json_payload,
    events_to_parquet,
)
from nexmark_vanilla_flink_spark.streaming.queries import q5_hot_items_stream
from nexmark_vanilla_flink_spark.streaming.runner import (
    run_available_now,
    use_rocksdb_state,
)
from nexmark_vanilla_flink_spark.streaming.sources import stream_nexmark


def test_salted_join_equals_plain_join(spark, sf_dir):
    s = nexmark_streams(spark, sf_dir)
    bids = s["bids"].withColumnRenamed("bidder_id", "user_id")
    persons = s["persons"].select("user_id").distinct()
    plain = bids.join(persons, "user_id").groupBy("user_id").count()
    salted = salted_join(bids, persons, "user_id").groupBy("user_id").count()
    assert sorted(map(tuple, plain.collect())) == sorted(
        map(tuple, salted.collect())
    )


def test_generator_parquet_roundtrip(spark):
    ev = generate_events_batch(spark, 9_000)
    with tempfile.TemporaryDirectory(prefix="gen_") as d:
        events_to_parquet(ev, f"{d}/events")
        back = spark.read.parquet(f"{d}/events")
        assert back.count() == 9_000
        # partition pruning by event type works on the written layout
        bids = back.filter(F.col("event_type") == 1)
        assert bids.count() == 4_000


def test_event_json_payload_shape(spark):
    ev = generate_events_batch(spark, 900)
    kv = event_json_payload(ev)
    row = kv.first()
    assert set(kv.columns) == {"key", "value"}
    assert '"event_id"' in row["value"]


def test_checkpoint_recovery_resumes_not_recomputes(spark, sf_dir):
    """Exactly-once restart on a durable (parquet) sink: a second
    AvailableNow run over the SAME checkpoint sees the offsets already
    committed and appends nothing; the output row count is unchanged."""

    def run(ck: str, out: str) -> int:
        s = stream_nexmark(spark, sf_dir)
        q = (
            q5_hot_items_stream(s["bids"])
            .writeStream.format("parquet")
            .option("path", out)
            .option("checkpointLocation", ck)
            .outputMode("append")
            .trigger(availableNow=True)
            .start()
        )
        q.awaitTermination(300)
        if q.exception() is not None:
            raise q.exception()
        return spark.read.parquet(out).count()

    with tempfile.TemporaryDirectory(prefix="ck_") as d:
        n1 = run(f"{d}/ck", f"{d}/out")
        n2 = run(f"{d}/ck", f"{d}/out")  # same checkpoint → no reprocessing
        assert n2 == n1


def test_rocksdb_state_provider_runs(spark, sf_dir):
    use_rocksdb_state(spark)
    try:
        s = stream_nexmark(spark, sf_dir)
        out = run_available_now(
            q5_hot_items_stream(s["bids"]), output_mode="complete", name="rdb"
        )
        assert out.count() > 0
    finally:
        spark.conf.unset("spark.sql.streaming.stateStore.providerClass")


def test_compact_parquet_bounds_file_count(spark, sf_dir):
    from nexmark_vanilla_flink_spark.sources.writer import compact_parquet
    import glob
    import tempfile

    ev = generate_events_batch(spark, 50_000)
    with tempfile.TemporaryDirectory(prefix="cmp_") as d:
        # simulate micro-batch litter: 32 small files
        ev.repartition(32).write.parquet(f"{d}/small")
        small = glob.glob(f"{d}/small/*.parquet")
        assert len(small) >= 30
        compact_parquet(spark.read.parquet(f"{d}/small"), f"{d}/big", 25_000)
        big = glob.glob(f"{d}/big/*.parquet")
        assert len(big) <= 3, big
        assert spark.read.parquet(f"{d}/big").count() == 50_000


def test_stateful_resume_after_midstream_crash(spark, tmp_path):
    """Crash BETWEEN micro-batches of a stateful windowed aggregation, then
    resume from the durable checkpoint: batch 0's window state must be
    RESTORED (not recomputed) and the ledgered output must equal the batch
    answer for every watermark-closed window — the state-recovery half of
    exactly-once that test_checkpoint_recovery (nothing-left-to-do resume)
    and exactly_once_sink_replay (stateless pipeline) do not cover."""
    from nexmark_vanilla_flink_spark.streaming.runner import (
        idempotent_batch_writer,
        read_committed,
        run_foreach_batch,
    )

    in_dir = str(tmp_path / "in")
    # 3 files, 300 rows each; one event per second from a fixed epoch so
    # 10-second windows span file (= micro-batch) boundaries
    for part in range(3):
        spark.range(part * 300, (part + 1) * 300).select(
            F.col("id"),
            F.timestamp_seconds(F.lit(1_600_000_000) + F.col("id")).alias("ts"),
        ).coalesce(1).write.mode("append").parquet(in_dir)
    static = spark.read.parquet(in_dir)

    def _stream():
        return (
            spark.readStream.schema(static.schema)
            .option("maxFilesPerTrigger", "1")
            .parquet(in_dir)
            .withWatermark("ts", "5 seconds")
            .groupBy(F.window("ts", "10 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_timestamp("w.start").alias("w_start_s"), "n")
        )

    out, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    boom = {"armed": True}

    def _hook(batch_id):
        if batch_id == 1 and boom["armed"]:
            raise RuntimeError("injected crash before batch-1 ledger commit")

    writer = idempotent_batch_writer(out, pre_commit_hook=_hook)
    with pytest.raises(Exception, match="injected crash"):
        run_foreach_batch(_stream(), writer, checkpoint_dir=ck)
    boom["armed"] = False
    run_foreach_batch(_stream(), writer, checkpoint_dir=ck)

    got = {
        (r.w_start_s, r.n) for r in read_committed(spark, out).collect()
    }
    # batch truth, restricted to windows the final watermark closed
    max_ts = 1_600_000_000 + 899
    wm = max_ts - 5
    expected = {
        (r.w_start_s, r.n)
        for r in (
            static.groupBy(F.window("ts", "10 seconds").alias("w"))
            .agg(F.count(F.lit(1)).alias("n"))
            .select(F.unix_timestamp("w.start").alias("w_start_s"), "n")
            .filter(F.unix_timestamp(F.col("w.end")) <= wm)
            .collect()
        )
    }
    assert expected, "no closed windows; fixture broken"
    assert got == expected
