"""Bucketed streaming twins must emit the EXACT row set of their per-key
replicas (r9, VERDICT r8 task 3): `bucketed_stateful` coarsens keyed
state into hash buckets to amortize the per-key Python group-call
machinery, and this suite is what licenses that — the per-key replicas
are the reference forms (they sit under the batch-oracle hash gate via
the replay entries' shared oracles), so set-equality here transfers the
oracle guarantee to the bucketed twins. Run at sf0.001 like the rest of
CI; the driver re-gates the bucketed entries at sf0.01.
"""

import pytest

from nexmark_vanilla_flink_spark.plans.linkage import _sentinel_event_stream
from nexmark_vanilla_flink_spark.streaming.runner import run_available_now
from nexmark_vanilla_flink_spark.plans.linkage import _FUNNEL_WINDOW_US
from nexmark_vanilla_flink_spark.streaming.stateful import (
    ewma_stateful,
    ewma_stateful_bucketed,
    funnel_stateful,
    funnel_stateful_bucketed,
    scd2_stateful,
    scd2_stateful_bucketed,
    skipgram_stateful,
    skipgram_stateful_bucketed,
)

PAIRS = {
    "ewma": (ewma_stateful, ewma_stateful_bucketed, True),
    "scd2": (scd2_stateful, scd2_stateful_bucketed, False),
    "skipgram": (skipgram_stateful, skipgram_stateful_bucketed, False),
    # per-key-TIMER form vs bucketed flush-horizon emission: the row SET
    # must be identical even though emission timing differs
    "funnel": (
        lambda s, f: funnel_stateful(s, f, _FUNNEL_WINDOW_US, per_key_timers=True),
        lambda s, f: funnel_stateful_bucketed(s, f, _FUNNEL_WINDOW_US),
        False,
    ),
}


@pytest.mark.parametrize("name", sorted(PAIRS))
def test_bucketed_matches_per_key(spark, sf_dir, name):
    per_key, bucketed, with_value = PAIRS[name]
    stream, flush_ms = _sentinel_event_stream(
        spark, sf_dir, with_value=with_value
    )
    ref = run_available_now(per_key(stream, flush_ms), output_mode="append")
    stream2, flush_ms2 = _sentinel_event_stream(
        spark, sf_dir, with_value=with_value
    )
    got = run_available_now(
        bucketed(stream2, flush_ms2), output_mode="append"
    )
    assert [f.name for f in got.schema.fields] == [
        f.name for f in ref.schema.fields
    ]
    a = sorted([tuple(r) for r in got.collect()], key=repr)
    b = sorted([tuple(r) for r in ref.collect()], key=repr)
    assert len(a) == len(b) and a == b, f"{name}: {len(a)} vs {len(b)} rows"
    assert len(a) > 0


def test_bucketed_small_bucket_count(spark, sf_dir):
    """n_buckets smaller than the key count still yields the identical
    set — bucket hashing only affects placement, never the fold."""
    stream, flush_ms = _sentinel_event_stream(spark, sf_dir, with_value=True)
    ref = run_available_now(
        ewma_stateful_bucketed(stream, flush_ms), output_mode="append"
    )
    from nexmark_vanilla_flink_spark.streaming.stateful import (
        EWMA_OUTPUT,
        bucketed_stateful,
    )

    stream2, flush_ms2 = _sentinel_event_stream(
        spark, sf_dir, with_value=True
    )

    def fold(uid, ustate, rows):
        acc, n, last_v = ustate or (0, 0, 0)
        for r in rows:
            x = int(r[3])
            acc = (acc + x) // 2
            last_v = x
            n += 1
        return (acc, n, last_v), []

    def final(uid, ustate):
        acc, n, last_v = ustate
        return [(uid, int(n), int(acc), int(last_v))] if n > 0 else []

    got = run_available_now(
        bucketed_stateful(
            stream2, flush_ms2, ["v_fp"], fold, final, EWMA_OUTPUT,
            n_buckets=3,
        ),
        output_mode="append",
    )
    a = sorted([tuple(r) for r in got.collect()], key=repr)
    b = sorted([tuple(r) for r in ref.collect()], key=repr)
    assert a == b


def test_multibatch_timer_path(spark, sf_dir, tmp_path):
    """The sentinel-less CONTINUOUS path still works multi-batch: events
    arrive across 3 time-ordered files (maxFilesPerTrigger=1), each batch
    folds only the watermark-finalized prefix, and the end-of-horizon
    TIMER (not the end-of-input sentinel) flushes the finals in the
    trailing no-data batch. Output set must equal the sentinel-driven
    single-batch replay — the r11 fast path and the timer path are two
    emission schedules over one fold."""
    import os

    from pyspark.sql import functions as F

    from nexmark_vanilla_flink_spark.sources.tables import load_table

    ev = load_table(spark, sf_dir, "events").select(
        "user_id",
        "event_type",
        F.expr("ts_ns DIV 1000").alias("us"),
        "event_id",
        "ts",
        F.expr("CAST(round(value * 1000) AS BIGINT)").alias("v_fp"),
    )
    lo, hi = ev.agg(F.min("us"), F.max("us")).collect()[0]
    cut1, cut2 = lo + (hi - lo) // 3, lo + 2 * (hi - lo) // 3
    d = str(tmp_path / "multibatch")
    os.makedirs(d)
    for i, cond in enumerate(
        [
            F.col("us") < cut1,
            (F.col("us") >= cut1) & (F.col("us") < cut2),
            F.col("us") >= cut2,
        ]
    ):
        stage = str(tmp_path / f"stage{i}")
        ev.filter(cond).coalesce(1).write.parquet(stage)
        part = next(
            f for f in os.listdir(stage) if f.endswith(".parquet")
        )
        os.rename(f"{stage}/{part}", f"{d}/f{i}.parquet")
        os.utime(f"{d}/f{i}.parquet", (1_000_000_000 + i, 1_000_000_000 + i))
    stream = (
        spark.readStream.schema(ev.schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
    )
    # horizon 1 h before the last event: past every batch's data but below
    # the final watermark, so the flush comes from hasTimedOut, never from
    # a sentinel (there is none in this stream)
    flush_ms = hi // 1000 - 3600 * 1000
    got = run_available_now(
        ewma_stateful_bucketed(stream, flush_ms), output_mode="append"
    )
    ref_stream, ref_flush = _sentinel_event_stream(
        spark, sf_dir, with_value=True
    )
    ref = run_available_now(
        ewma_stateful_bucketed(ref_stream, ref_flush),
        output_mode="append",
        no_data_batch=False,
    )
    a = sorted([tuple(r) for r in got.collect()], key=repr)
    b = sorted([tuple(r) for r in ref.collect()], key=repr)
    assert len(a) > 0 and a == b


def test_union_join_bucketed_parity(spark, sf_dir):
    """The bucketed Q8 union join must emit the exact row SET of the
    per-key replica (which itself matches the batch join —
    tests/test_stateful.py). n_buckets=3 < key count forces multiple
    users per bucket, exercising the per-user buffer isolation."""
    from pyspark.sql import functions as F

    from nexmark_vanilla_flink_spark.streaming.sources import (
        stream_events,
        stream_nexmark,
    )
    from nexmark_vanilla_flink_spark.streaming.stateful import (
        union_join_stateful,
        union_join_stateful_bucketed,
    )

    s = stream_nexmark(spark, sf_dir)
    ref = run_available_now(
        union_join_stateful(s["persons"], s["auctions"]),
        output_mode="append",
        no_data_batch=False,
    )
    ev = stream_events(spark, sf_dir)
    tagged = ev.filter(F.col("event_type").isin("signup", "view")).select(
        F.when(F.col("event_type") == "signup", 1)
        .otherwise(2)
        .cast("int")
        .alias("side"),
        F.col("user_id"),
        F.col("event_id").alias("row_id"),
        F.col("ts"),
    )
    got = run_available_now(
        union_join_stateful_bucketed(tagged, n_buckets=3),
        output_mode="append",
        no_data_batch=False,
    )
    a = sorted([tuple(r) for r in got.collect()], key=repr)
    b = sorted([tuple(r) for r in ref.collect()], key=repr)
    assert len(a) > 0 and a == b


def test_skipgram_counted_parity(spark, sf_dir):
    """The counted twin's (center, context) -> sum(cnt) table must equal
    the raw bucketed twin's pair counts (which itself is set-parity-pinned
    against the per-key replica above)."""
    from collections import Counter

    from nexmark_vanilla_flink_spark.streaming.stateful import (
        skipgram_stateful_bucketed,
        skipgram_stateful_counted,
    )

    stream, flush_ms = _sentinel_event_stream(spark, sf_dir)
    raw = run_available_now(
        skipgram_stateful_bucketed(stream, flush_ms),
        output_mode="append",
        no_data_batch=False,
    )
    ref = Counter((r["center"], r["context"]) for r in raw.collect())
    stream2, flush_ms2 = _sentinel_event_stream(spark, sf_dir)
    counted = run_available_now(
        skipgram_stateful_counted(stream2, flush_ms2),
        output_mode="append",
        no_data_batch=False,
    )
    got: dict = {}
    for r in counted.collect():
        k = (r["center"], r["context"])
        got[k] = got.get(k, 0) + r["cnt"]
    assert len(got) > 0 and got == dict(ref)
