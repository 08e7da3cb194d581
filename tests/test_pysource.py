"""The `nexmark` Python DataSource connector: bounded reads with explicit
input partitions, deterministic replay, and the offset-tracked streaming
reader (S1-S4 as a registered Spark source — SURVEY.md §2.1)."""

import time

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.sources.generator import EPOCH
from nexmark_vanilla_flink_spark.sources.pysource import (
    NexmarkDataSource,
    _row,
)


def _read(spark, **opts):
    spark.dataSource.register(NexmarkDataSource)
    r = spark.read.format("nexmark")
    for k, v in opts.items():
        r = r.option(k, v)
    return r.load()


def test_batch_read_deterministic(spark):
    a = sorted(_read(spark, events=2000, partitions=4).collect())
    b = sorted(_read(spark, events=2000, partitions=7).collect())
    # same rows regardless of partition split, no gaps or dups
    assert a == b
    assert len(a) == 2000
    assert [r.event_id for r in a] == list(range(2000))


def test_batch_mix_ratio(spark):
    df = _read(spark, events=9 * 500)
    counts = dict(
        df.groupBy("event_type").count().rdd.map(tuple).collect()
    )
    # 1 person : 4 auctions : 4 bids per 9-event epoch
    assert counts[2] == 500 and counts[0] == 2000 and counts[1] == 2000


def test_batch_rows_match_python_model(spark):
    rows = sorted(_read(spark, events=EPOCH * 3, seed=7).collect())
    for r in rows:
        assert tuple(r) == _row(r.event_id, 7, 10_000)


def test_stream_reader_replays_batch_prefix(spark, tmp_path):
    """The streaming reader over offsets [0, k) must emit exactly the
    bounded reader's first k rows — the replay/exactly-once contract."""
    spark.dataSource.register(NexmarkDataSource)
    q = (
        spark.readStream.format("nexmark")
        .option("rowsPerBatch", 500)
        .load()
        .writeStream.format("memory")
        .queryName("nexmark_pysource_stream")
        .option("checkpointLocation", str(tmp_path / "ckpt"))
        .start()
    )
    try:
        deadline = time.time() + 60
        while time.time() < deadline:
            n = spark.sql(
                "SELECT count(*) FROM nexmark_pysource_stream"
            ).collect()[0][0]
            if n >= 1000:
                break
            time.sleep(0.5)
        assert n >= 1000
    finally:
        q.stop()
    got = sorted(
        spark.sql("SELECT * FROM nexmark_pysource_stream").collect()
    )[:1000]
    want = sorted(_read(spark, events=len(got)).collect())
    assert [tuple(r) for r in got[: len(want)]] == [tuple(r) for r in want]


def test_stream_offsets_are_contiguous(spark):
    from nexmark_vanilla_flink_spark.sources.pysource import (
        NexmarkStreamReader,
    )

    r = NexmarkStreamReader({"rowsPerBatch": 100, "partitions": 3})
    start = r.initialOffset()
    end = r.latestOffset()
    parts = r.partitions(start, end)
    ids = [i for p in parts for i in range(p.start, p.end)]
    assert ids == list(range(start["id"], end["id"]))


def test_batch_hot_key_skew(spark):
    df = _read(spark, events=90_000)
    bids = df.filter(F.col("event_type") == 1)
    top = (
        bids.groupBy("ref_auction_id")
        .count()
        .orderBy(F.desc("count"))
        .limit(1)
        .collect()[0]
    )
    uniform_share = 1.0 / bids.select("ref_auction_id").distinct().count()
    assert top["count"] / bids.count() > 5 * uniform_share
