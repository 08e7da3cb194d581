"""The Kafka wire contract round-trips without a broker: the producer's JSON
payload parses back into the exact generator events (the unified-topic
encode/decode pair, S6/K2), and the rate-source generator is deterministic —
the streaming events are a prefix-equal replay of the batch generator."""

import tempfile
import time

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.sources.generator import (
    generate_events_batch,
    generate_events_stream,
)
from nexmark_vanilla_flink_spark.sources.writer import (
    decode_event_json,
    event_json_payload,
)


def test_event_json_roundtrip(spark):
    ev = generate_events_batch(spark, 9_000)
    back = decode_event_json(event_json_payload(ev))
    cols = [
        "event_id", "event_type", "ts_ns", "person_id",
        "ref_person_id", "ref_auction_id", "price",
    ]
    a = sorted(map(tuple, ev.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b


def test_stream_generator_prefix_equals_batch(spark):
    """Same seed → the rate-source stream emits exactly the batch rows for
    every id it produced (pure function of id; restart-safe replay)."""
    q = (
        generate_events_stream(spark, rows_per_second=5_000, seed=7)
        .writeStream.format("memory")
        .queryName("gen_det")
        .outputMode("append")
        .option("checkpointLocation", tempfile.mkdtemp(prefix="ck_gen_"))
        .start()
    )
    try:
        deadline = time.time() + 20
        while time.time() < deadline and spark.table("gen_det").count() < 2_000:
            time.sleep(0.5)
    finally:
        q.stop()
        q.awaitTermination(30)
    got = spark.table("gen_det")
    n = got.count()
    assert n >= 2_000
    max_id = got.agg(F.max("event_id")).collect()[0][0]
    want = {
        r["event_id"]: tuple(r)
        for r in generate_events_batch(spark, max_id + 1, events_per_sec=5_000, seed=7).collect()
    }
    for r in got.collect():
        assert tuple(r) == want[r["event_id"]], r["event_id"]


def test_consumer_decodes_producer_topic_streaming(spark, tmp_path):
    """End-to-end minus the broker: the (key, value) rows events_to_kafka_json
    would publish on 'nexmark-events' are replayed through readStream and the
    EXACT decode plan stream_kafka_events applies (decode_event_json) — the
    consumer must reproduce the generator events, proving the two halves of
    the wire contract share one schema."""
    ev = generate_events_batch(spark, 5_000)
    kv_dir = str(tmp_path / "kv")
    event_json_payload(ev).write.parquet(kv_dir)

    kv_stream = (
        spark.readStream.schema("key string, value string").parquet(kv_dir)
    )
    decoded = decode_event_json(kv_stream)  # same call as stream_kafka_events
    assert decoded.isStreaming
    out = str(tmp_path / "out")
    q = (
        decoded.writeStream.format("parquet")
        .option("path", out)
        .option("checkpointLocation", str(tmp_path / "ck"))
        .trigger(availableNow=True)
        .start()
    )
    q.awaitTermination(120)
    cols = [
        "event_id", "event_type", "ts_ns", "person_id",
        "ref_person_id", "ref_auction_id", "price",
    ]
    got = sorted(map(tuple, spark.read.parquet(out).select(*cols).collect()))
    want = sorted(map(tuple, ev.select(*cols).collect()))
    assert got == want


def test_driver_events_contract_roundtrip(spark, sf_dir):
    """The second (driver-events) contract round-trips too, on its own
    distinct topic schema: events-table rows → JSON payload → the consumer
    projection of stream_kafka_driver_events."""
    from nexmark_vanilla_flink_spark.sources.tables import events_with_key
    from nexmark_vanilla_flink_spark.streaming.sources import (
        decode_driver_event_json,
        driver_event_json_payload,
    )

    ev = events_with_key(spark, sf_dir).select(
        "event_id", "ts_ns", "user_id", "event_type", "value", "k"
    )
    back = decode_driver_event_json(driver_event_json_payload(ev))
    cols = ["event_id", "ts_ns", "user_id", "event_type", "value", "k"]
    a = sorted(map(tuple, ev.select(*cols).collect()))
    b = sorted(map(tuple, back.select(*cols).collect()))
    assert a == b
