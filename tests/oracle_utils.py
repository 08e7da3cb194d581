"""Cross-engine comparison mirroring the driver's correctness gate:
run the Spark query and the DuckDB oracle on the same parquet tables, sort
columns by name, canonicalize rows, compare."""

from __future__ import annotations

import math
from decimal import Decimal

import duckdb

from nexmark_vanilla_flink_spark.sources.tables import TABLE_NAMES


def duckdb_run(sf_dir: str, sql: str):
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    cur = con.execute(sql)
    cols = [d[0] for d in cur.description]
    return cols, cur.fetchall()


def _canon_value(v):
    # Driver-strict: the driver hashes pandas frames, where HUGEINT becomes
    # float64/object and DECIMAL stays Decimal — so engine output TYPES must
    # match, not just values. No Decimal→float coercion, no float rounding:
    # a type or ULP mismatch here would hash-fail at the driver too.
    if isinstance(v, float):
        return ("float", "NaN" if math.isnan(v) else v)
    if isinstance(v, Decimal):
        return ("decimal", str(v))
    if isinstance(v, bool):
        return ("bool", v)
    if isinstance(v, int):
        return ("int", v)
    if isinstance(v, (bytes, bytearray)):
        return ("bytes", bytes(v))
    return (type(v).__name__, v)


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, sf_dir: str, oracle: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows = duckdb_run(sf_dir, oracle)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs = canonicalize(s_cols, s_rows)
    cd = canonicalize(d_cols, d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
