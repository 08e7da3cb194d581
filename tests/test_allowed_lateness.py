"""Flink ``allowedLateness`` re-fire replica (VERDICT r10 task 6 — the
last semantic delta vs the reference): windows fire when the watermark
passes their end, late-but-in-bound rows RE-FIRE the updated pane,
later-than-bound rows are dropped (NexmarkQueryX.java:279-281; Spark's
native windowed agg would drop every late row). The synthetic case here
is hand-computable: three mtime-ordered files force the arrival order,
and every lifecycle path (watermark fire, in-bound re-fire, out-of-bound
drop, late-created pane, never-fired flush) is asserted exactly. The
full-scale twin is the oracle-gated entry ``qx_allowed_lateness_replay``.
"""

import os

import pyarrow as pa
import pyarrow.parquet as papq
import pytest

from nexmark_vanilla_flink_spark.plans.registry import REGISTRY
from nexmark_vanilla_flink_spark.streaming.runner import run_available_now
from nexmark_vanilla_flink_spark.streaming.stateful import (
    allowed_lateness_stateful,
)

import nexmark_vanilla_flink_spark.plans  # noqa: F401 — populate REGISTRY

WINDOW_S = 10
ALLOWED_S = 15

SCHEMA = pa.schema(
    [
        ("bid_id", pa.int64()),
        ("item_id", pa.int64()),
        ("bid", pa.float64()),
        ("ts", pa.timestamp("us")),
    ]
)


def _write(path, rows, mtime):
    """rows: list of (bid_id, item_id, bid, ts_seconds)."""
    papq.write_table(
        pa.Table.from_arrays(
            [
                pa.array([r[0] for r in rows], type=pa.int64()),
                pa.array([r[1] for r in rows], type=pa.int64()),
                pa.array([r[2] for r in rows], type=pa.float64()),
                pa.array(
                    [r[3] * 1_000_000 for r in rows], type=pa.int64()
                ).cast(pa.timestamp("us")),
            ],
            schema=SCHEMA,
        ),
        path,
    )
    os.utime(path, (mtime, mtime))


def test_lateness_lifecycle_exact(spark, tmp_path):
    """Hand-computed emissions for every pane lifecycle path.

    File 0 (on-time): auction 1 bids at t=5 (bid 10.0) and t=12 (20.0),
    auction 2 bid at t=95 (30.0), plus a max-ts row at t=100 for
    auction 3 (40.0). Watermark after file 0 = 100s - 2s = 98s, so the
    t∈[0,10) and t∈[10,20) and t∈[90,100)?? — no: [90,100) ends at 100
    > 98, NOT fired. Fired panes: [0,10) and [10,20).

    File 1 (late): a1 t=7 (50.0)  -> [0,10): end 10 +15s = 25 <= 98 —
    OUT of bound, dropped; a1 t=18 (60.0) -> [10,20): end 20 + 15 = 35
    <= 98 — dropped too. So use ALLOWED such that one is in bound:
    allowed 85 -> [10,20): 20+85=105 > 98 in bound (re-fire), [0,10):
    10+85=95 <= 98 dropped. A late row for auction 9 at t=13 (70.0)
    creates the [10,20) pane for a key with no on-time rows (late fire,
    v1). File 2: the end-of-input sentinel flushes [90,100) and [100,..)
    with their full aggregates.
    """
    allowed_s = 85
    d = str(tmp_path / "replay")
    os.makedirs(d)
    _write(
        f"{d}/f0.parquet",
        [
            (101, 1, 10.0, 5),
            (102, 1, 20.0, 12),
            (103, 2, 30.0, 95),
            (104, 3, 40.0, 100),
        ],
        1_000_000_000,
    )
    _write(
        f"{d}/f1.parquet",
        [
            (201, 1, 50.0, 7),  # [0,10): past end+85s — dropped
            (202, 1, 60.0, 18),  # [10,20): in bound — re-fire
            (203, 9, 70.0, 13),  # [10,20) for a1-less key — late-created
        ],
        1_000_000_001,
    )
    _write(
        f"{d}/f2.parquet", [(-1, -1, 0.0, 100 + 8 * 86400)], 1_000_000_002
    )

    from pyspark.sql import functions as F

    s = (
        spark.readStream.schema(
            "bid_id long, item_id long, bid double, ts timestamp"
        )
        .option("maxFilesPerTrigger", "1")
        .parquet(d)
        .select(
            F.col("item_id").alias("auction_id"),
            F.expr(
                f"(unix_micros(ts) DIV {WINDOW_S * 1_000_000}) * {WINDOW_S}"
            ).alias("w_start_s"),
            F.expr("unix_micros(ts)").alias("us"),
            "bid",
            "ts",
        )
    )
    out = run_available_now(
        allowed_lateness_stateful(s, WINDOW_S, allowed_s),
        output_mode="append",
        no_data_batch=False,
    )
    rows = sorted(
        [
            (
                r["auction_id"],
                r["w_start_s"],
                r["bid_count"],
                r["max_bid"],
                r["emit_version"],
            )
            for r in out.collect()
        ]
    )
    assert rows == [
        (1, 0, 1, 10.0, 1),  # [0,10) watermark fire; late 50.0 dropped
        (1, 10, 1, 20.0, 1),  # [10,20) watermark fire (frozen pane)
        (1, 10, 2, 60.0, 2),  # [10,20) RE-FIRE with the in-bound late row
        (2, 90, 1, 30.0, 1),  # never fired (end 100 > wm 98): flush
        (3, 100, 1, 40.0, 1),  # never fired: flush
        (9, 10, 1, 70.0, 1),  # late-created pane fires with late rows only
    ]


def test_entry_oracle_parity(spark, sf_dir):
    """The full-scale entry matches its DuckDB oracle (the same check the
    driver runs; kept here so CI pins it every run)."""
    import duckdb

    q = REGISTRY["qx_allowed_lateness_replay"]
    df = q.spark(spark, sf_dir)
    cols = sorted(df.columns)
    srows = sorted(
        [tuple(r[c] for c in cols) for r in df.collect()], key=repr
    )
    con = duckdb.connect()
    con.execute(
        "CREATE VIEW events AS SELECT * FROM "
        f"read_parquet('{sf_dir}/events.parquet')"
    )
    raw = con.execute(q.oracle).fetchall()
    ocols = [dsc[0] for dsc in con.execute(q.oracle).description]
    idx = [ocols.index(c) for c in cols]
    orows = sorted([tuple(r[i] for i in idx) for r in raw], key=repr)
    con.close()
    assert len(srows) > 0 and srows == orows
    # the re-fire path must actually be exercised at this SF: select the
    # emit_version column BY NAME (ADVICE r11: a positional r[-2] clause
    # landed on max_bid under the sorted column order and could satisfy
    # the check whenever a bid of 2.0 existed, without any pane re-firing)
    ev = cols.index("emit_version")
    assert any(r[ev] == 2 for r in srows)
