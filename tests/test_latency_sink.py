"""A7/K1 on a LIVE stream: the foreachBatch latency tracker must produce
non-empty stats rows when event time is current (the historical-replay case
yields n=0 by design — the 10-min outlier filter)."""

import glob
import tempfile
import time

from pyspark.sql import functions as F


def test_latency_sink_live(spark):
    # events stamped with current wall time → latency is ~0, passes the filter
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 1000)
        .load()
        .withColumn("ev_ts", F.col("timestamp"))
    )
    from nexmark_vanilla_flink_spark.streaming.runner import latency_stats_sink

    out_dir = tempfile.mkdtemp(prefix="lat_live_")
    q = latency_stats_sink(rate, "ev_ts", out_dir, trigger_seconds=1)
    try:
        deadline = time.time() + 30
        rows = []
        while time.time() < deadline:
            time.sleep(1)
            rows = [
                line
                for f in glob.glob(f"{out_dir}/*.csv")
                for line in open(f).read().splitlines()
                if line.strip()
            ]
            if any(int(r.split(",")[1]) > 0 for r in rows):
                break
        assert rows, "no stats rows written"
        counted = [r for r in rows if int(r.split(",")[1]) > 0]
        assert counted, f"all stats rows empty: {rows[:3]}"
        # mean latency is a sane non-negative microsecond figure
        mean_us = float(counted[-1].split(",")[2])
        assert 0 <= mean_us < 600 * 1_000_000
    finally:
        q.stop()
        q.awaitTermination(30)


def test_latency_probes_density_and_sink(spark):
    """P6: 1-in-N probe tagging is exact and deterministic on the unique
    event id (NexmarkQuery8.java:635-644's 200k sampling, retry-stable
    Spark form), and the probe sink reports stats over ONLY the probes."""
    from nexmark_vanilla_flink_spark.streaming.runner import (
        probe_latency_sink,
        with_latency_probes,
    )

    # batch check: exact density + determinism
    ev = spark.range(0, 10_000).withColumnRenamed("id", "event_id")
    tagged = with_latency_probes(ev, "event_id", every=1_000)
    probes = tagged.filter("is_probe")
    assert probes.count() == 10
    assert [r.event_id for r in probes.orderBy("event_id").collect()] == [
        i * 1_000 for i in range(10)
    ]

    # live-stream check: the probe sink writes stats counting ONLY probes
    rate = (
        spark.readStream.format("rate")
        .option("rowsPerSecond", 2_000)
        .load()
        .withColumn("ev_ts", F.col("timestamp"))
        .withColumnRenamed("value", "event_id")
    )
    out_dir = tempfile.mkdtemp(prefix="lat_probe_")
    q = probe_latency_sink(
        with_latency_probes(rate, "event_id", every=100),
        "ev_ts",
        out_dir,
        trigger_seconds=1,
    )
    try:
        deadline = time.time() + 30
        counted = []
        total = 0
        while time.time() < deadline:
            time.sleep(1)
            rows = [
                line
                for f in glob.glob(f"{out_dir}/*.csv")
                for line in open(f).read().splitlines()
                if line.strip()
            ]
            counted = [r for r in rows if int(r.split(",")[1]) > 0]
            total = sum(int(r.split(",")[1]) for r in rows)
            if counted:
                break
        assert counted, "no probe stats rows written"
        # ~2000 ev/s at 1-in-100 → ~20 probes/s; far below the raw rate
        assert 0 < total < 2_000, total
    finally:
        q.stop()
