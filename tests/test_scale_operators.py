"""Scale-path operators: salted join equivalence, checkpoint recovery,
generator→parquet round trip, RocksDB state provider."""

import tempfile

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
