"""Exactly-once sink semantics through crashes (reference production surface
CheckpointingMode.EXACTLY_ONCE, NexmarkQuery8.java:454-473): the idempotent
ledgered parquet sink must land every input row exactly once no matter where
a failure falls — after a batch's commit (replay must skip), or between its
data write and its commit (replay must overwrite, then commit once)."""

import pytest
from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.sources.tables import load_table
from nexmark_vanilla_flink_spark.streaming.runner import (
    idempotent_batch_writer,
    read_committed,
    run_foreach_batch,
)


def _split_input(spark, sf_dir, tmp_path, n_files=4):
    src = load_table(spark, sf_dir, "events").select(
        "event_id", "user_id", "event_type", "value"
    )
    in_dir = str(tmp_path / "in")
    src.repartition(n_files).write.parquet(in_dir)
    return src, in_dir


def _stream(spark, schema, in_dir):
    return (
        spark.readStream.schema(schema)
        .option("maxFilesPerTrigger", "1")
        .parquet(in_dir)
    )


def test_crash_between_write_and_commit_no_dupes(spark, sf_dir, tmp_path):
    src, in_dir = _split_input(spark, sf_dir, tmp_path)
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    boom = {"armed": True}

    def pre_commit(batch_id):
        if batch_id == 2 and boom["armed"]:
            boom["armed"] = False
            raise RuntimeError("injected crash before ledger commit")

    with pytest.raises(Exception, match="injected crash"):
        run_foreach_batch(
            _stream(spark, src.schema, in_dir),
            idempotent_batch_writer(out_dir, pre_commit_hook=pre_commit),
            checkpoint_dir=ck,
        )
    # crashed batch's data exists on disk but is NOT visible (unledgered)
    import os

    assert os.path.exists(os.path.join(out_dir, "data", "batch_id=2"))
    committed_before = {
        int(f[: -len(".done")])
        for f in os.listdir(os.path.join(out_dir, "_ledger"))
    }
    assert 2 not in committed_before and 0 in committed_before

    # resume on the same checkpoint: replays batch 2 (overwrite + commit),
    # finishes the rest; committed batches are skipped via the ledger
    run_foreach_batch(
        _stream(spark, src.schema, in_dir),
        idempotent_batch_writer(out_dir),
        checkpoint_dir=ck,
    )
    got = read_committed(spark, out_dir)
    assert got.count() == src.count()
    assert got.select(F.count_distinct("event_id")).collect()[0][0] == src.count()
    a = sorted(map(tuple, got.collect()))
    b = sorted(map(tuple, src.collect()))
    assert a == b


def test_rerun_after_success_is_noop(spark, sf_dir, tmp_path):
    """A full re-run on the same checkpoint AND ledger must not duplicate
    anything (availableNow finds no new files; even a forced replay of a
    committed batch is skipped by the ledger)."""
    src, in_dir = _split_input(spark, sf_dir, tmp_path, n_files=2)
    out_dir, ck = str(tmp_path / "out"), str(tmp_path / "ck")
    for _ in range(2):
        run_foreach_batch(
            _stream(spark, src.schema, in_dir),
            idempotent_batch_writer(out_dir),
            checkpoint_dir=ck,
        )
    assert read_committed(spark, out_dir).count() == src.count()
    # and a direct double-invocation of the writer on the same batch id
    # (simulating a replayed task retry) is idempotent too
    writer = idempotent_batch_writer(out_dir)
    batch0 = spark.read.parquet(in_dir).limit(10)
    writer(batch0, 999)
    writer(batch0, 999)
    assert (
        read_committed(spark, out_dir).count() == src.count() + 10
    )
