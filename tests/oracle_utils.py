"""Cross-engine comparison mirroring the driver's correctness gate:
run the Spark query and the DuckDB oracle on the same parquet tables, sort
columns by name, canonicalize rows, compare.

r5: the DuckDB side is fetched through Arrow (``fetch_arrow_table``), the
same typed representation the driver hashes — ``fetchall()`` collapsed
HUGEINT to a plain Python ``int`` and hid type divergence, which is exactly
how the r4 ``generated_event_mix_stats`` driver fail (uncast ``sum()`` →
HUGEINT vs Spark BIGINT) passed this suite. Arrow keeps HUGEINT as
``decimal128(38,0)`` (→ ``Decimal`` values), so both the value comparison
and the new dtype assertion now fail on an uncast ``sum()``.
"""

from __future__ import annotations

import math
import re
from decimal import Decimal

import duckdb

from nexmark_vanilla_flink_spark.sources.tables import TABLE_NAMES


def duckdb_run(sf_dir: str, sql: str):
    """Returns (cols, rows, arrow_types). Values come from the Arrow table
    (driver-faithful typing: HUGEINT→Decimal, DECIMAL stays Decimal),
    arrow_types is {col: str(pa.DataType)} for the dtype assertion."""
    con = duckdb.connect()
    for t in TABLE_NAMES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    tbl = con.execute(sql).fetch_arrow_table()
    cols = tbl.schema.names
    arrow_types = {f.name: str(f.type) for f in tbl.schema}
    # Column-wise to_pylist: python scalars (int/float/Decimal/str/bytes/
    # date/datetime/list), no numpy reprs.
    col_values = [tbl.column(i).to_pylist() for i in range(tbl.num_columns)]
    rows = list(zip(*col_values)) if cols else []
    if tbl.num_rows and not rows:
        rows = [()] * tbl.num_rows
    return cols, rows, arrow_types


# Spark simpleString dtype -> regex over the DuckDB Arrow type string.
# Signed-integer WIDTHS are one family: the driver has green-lit Spark int32
# vs DuckDB int64 (e.g. ann_ivf_topk's row_number) across rounds — its hash
# canonicalizes plain ints — while HUGEINT (decimal128(38,0)) diverges.
# decimal(p,s) must match exactly; int vs decimal/float is strict.
_INT_FAMILY = re.compile(r"^(u?int(8|16|32|64))$")
_DTYPE_RULES: list[tuple[re.Pattern, re.Pattern]] = [
    (re.compile(r"^bigint$"), _INT_FAMILY),
    (re.compile(r"^int$"), _INT_FAMILY),
    (re.compile(r"^smallint$"), _INT_FAMILY),
    (re.compile(r"^tinyint$"), _INT_FAMILY),
    (re.compile(r"^double$"), re.compile(r"^double$")),
    (re.compile(r"^float$"), re.compile(r"^float$")),
    (re.compile(r"^string$"), re.compile(r"^(large_)?string$")),
    (re.compile(r"^boolean$"), re.compile(r"^bool$")),
    (re.compile(r"^date$"), re.compile(r"^date32")),
    (re.compile(r"^timestamp(_ntz)?$"), re.compile(r"^timestamp")),
    (re.compile(r"^binary$"), re.compile(r"^(large_)?binary$")),
    (re.compile(r"^decimal\((\d+),(\d+)\)$"), re.compile(r"^decimal128\((\d+), ?(\d+)\)$")),
    (re.compile(r"^array<"), re.compile(r"^(large_)?list")),
    (re.compile(r"^map<"), re.compile(r"^map")),
    (re.compile(r"^struct<"), re.compile(r"^struct")),
]


def dtype_compatible(spark_dtype: str, arrow_type: str) -> bool:
    for s_pat, a_pat in _DTYPE_RULES:
        sm = s_pat.match(spark_dtype)
        if sm:
            am = a_pat.match(arrow_type)
            if not am:
                return False
            if sm.groups():  # decimal precision/scale must agree
                return sm.groups() == am.groups()
            return True
    # Unmapped Spark dtype: fail loudly so the mapping table gets extended
    # rather than silently passing.
    return False


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
    if isinstance(v, list):
        return ("list", tuple(_canon_value(x) for x in v))
    return (type(v).__name__, v)


def canonicalize(cols: list[str], rows: list[tuple]) -> list[tuple]:
    order = sorted(range(len(cols)), key=lambda i: cols[i])
    out = [tuple(_canon_value(r[i]) for i in order) for r in rows]
    return sorted(out, key=repr)


def compare(spark_df, sf_dir: str, oracle: str) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_dtypes = dict(spark_df.dtypes)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows, d_types = duckdb_run(sf_dir, oracle)
    if sorted(s_cols) != sorted(d_cols):
        return False, f"schema mismatch: spark={sorted(s_cols)} duckdb={sorted(d_cols)}"
    bad_types = [
        (c, s_dtypes[c], d_types[c])
        for c in s_cols
        if not dtype_compatible(s_dtypes[c], d_types[c])
    ]
    if bad_types:
        return False, f"dtype mismatch (spark vs duckdb-arrow): {bad_types}"
    if len(s_rows) != len(d_rows):
        return False, f"row count mismatch: spark={len(s_rows)} duckdb={len(d_rows)}"
    cs = canonicalize(s_cols, s_rows)
    cd = canonicalize(d_cols, d_rows)
    if cs != cd:
        diff = [(a, b) for a, b in zip(cs, cd) if a != b][:5]
        return False, f"value mismatch, first diffs: {diff}"
    return True, f"ok ({len(s_rows)} rows)"
