"""CM text-source round-trip [S8]: serialize a CM trace in the reference's
whitespace format, re-parse it, and check the windowed-load query agrees with
computing directly on the source rows."""

import tempfile

from pyspark.sql import functions as F

from nexmark_vanilla_flink_spark.sources.cm import (
    CM_SCHEMA,
    cm_windowed_load,
    read_cm_text,
    write_cm_text,
)
from nexmark_vanilla_flink_spark.sources.tables import load_table


def _cm_from_events(spark, sf_dir):
    ev = load_table(spark, sf_dir, "events")
    return ev.select(
        F.expr("ts_ns DIV 1000000").alias("ts_ms"),
        F.col("user_id").alias("job_id"),
        (F.col("event_id") % 100).alias("task_id"),
        (F.col("event_id") % 17).alias("machine_id"),
        F.lit(0).alias("event_type"),
        F.col("user_id").cast("int").alias("user_id"),
        (F.col("event_id") % 5).cast("int").alias("category"),
        F.lit(1).cast("int").alias("priority"),
        F.round(F.col("value"), 2).cast("float").alias("cpu"),
        F.lit(1.5).cast("float").alias("ram"),
        F.lit(0.25).cast("float").alias("disk"),
        F.lit(0).cast("int").alias("constraints"),
    )


def test_cm_text_roundtrip(spark, sf_dir):
    cm = _cm_from_events(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="cm_") as d:
        path = f"{d}/trace"
        write_cm_text(cm, path)
        parsed = read_cm_text(spark, path)
        assert [f.name for f in parsed.schema.fields[:-1]] == [
            f.name for f in CM_SCHEMA.fields
        ]
        assert parsed.count() == cm.count()
        # typed columns survive the text round trip
        a = sorted(
            [tuple(r) for r in cm.select("ts_ms", "job_id", "cpu").collect()]
        )
        b = sorted(
            [tuple(r) for r in parsed.select("ts_ms", "job_id", "cpu").collect()]
        )
        assert a == b


def test_cm_windowed_load_from_text(spark, sf_dir):
    cm = _cm_from_events(spark, sf_dir)
    with tempfile.TemporaryDirectory(prefix="cm_") as d:
        path = f"{d}/trace"
        write_cm_text(cm, path)
        parsed = read_cm_text(spark, path)
        out = cm_windowed_load(parsed, window_s=600)
        ref = (
            cm.groupBy(
                "job_id",
                F.expr("CAST(ts_ms DIV 600000 AS BIGINT) * 600").alias("w_start_s"),
            )
            .agg(
                F.sum(F.col("cpu").cast("decimal(18,4)"))
                .cast("double")
                .alias("total_cpu"),
                F.count(F.lit(1)).alias("n_records"),
            )
        )
        assert sorted(map(tuple, out.collect())) == sorted(map(tuple, ref.collect()))
