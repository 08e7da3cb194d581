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


def duckdb_run(sf_dir: str, sql: str, con=None):
    """Returns (cols, rows, arrow_types). Values come from the Arrow table
    (driver-faithful typing: HUGEINT→Decimal, DECIMAL stays Decimal),
    arrow_types is {col: str(pa.DataType)} for the dtype assertion.
    Pass ``con`` to reuse a caller-owned connection (compare_capped's
    materialize-once path); the caller then owns view setup + close."""
    owned = con is None
    if owned:
        con = duckdb.connect()
    try:
        if owned:
            for t in TABLE_NAMES:
                con.execute(
                    f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
                )
        tbl = con.execute(sql).fetch_arrow_table()
    finally:
        # An unclosed connection keeps its buffer pool alive; sweeps that
        # run hundreds of oracles in one process compound leaked pools into
        # host-wide DuckDB "bad allocation" OOMs (observed r9, 10x sweep).
        if owned:
            con.close()
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


def compare(spark_df, sf_dir: str, oracle: str, con=None) -> tuple[bool, str]:
    s_cols = spark_df.columns
    s_dtypes = dict(spark_df.dtypes)
    s_rows = [tuple(r) for r in spark_df.collect()]
    d_cols, d_rows, d_types = duckdb_run(sf_dir, oracle, con=con)
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


# ---------------------------------------------------------------------------
# Capped compare for scale sweeps (tools/scale_sweep.py)
# ---------------------------------------------------------------------------
# The driver-faithful ``compare`` collects BOTH result sets into Python and
# sorts them — exact, but O(rows) driver memory. At 10x data the entries
# whose TRUE output grows quadratically under replication (the interval
# join keys on the fixed 100-value category dimension, so 10x auctions x
# 10x bids per key = ~100x output rows; see tools/scale10.py's
# fixed-cardinality-dimension note) produce tens of millions of rows —
# a dual collect would OOM the sweep. Above a row cap we fall back to a
# DISTRIBUTED aggregate fingerprint: row count + per-column typed
# aggregates (exact decimal sums for integrals / string lengths / epoch
# micros, null counts, min/max; tolerance-banded double sums), computed
# engine-side in both engines with matched semantics. Weaker than the
# full row-set hash — the sweep records which mode ran so the scaling
# table can say so.

COMPARE_CAP_ROWS = 2_000_000
_DOUBLE_REL_TOL = 1e-6


def _fingerprint_exprs(cols: list[str], dtypes: dict[str, str]):
    """(spark_exprs, duck_exprs, labels) — matched aggregate semantics."""
    spark_e, duck_e, labels = [], [], []

    def add(lbl, s, d):
        labels.append(lbl)
        spark_e.append(f"{s} AS `{lbl}`")
        duck_e.append(f'{d} AS "{lbl}"')

    add("n_rows", "COUNT(*)", "CAST(COUNT(*) AS BIGINT)")
    for c in sorted(cols):
        dt = dtypes[c]
        add(f"{c}#nulls", f"COUNT(*) - COUNT(`{c}`)",
            f'CAST(COUNT(*) - COUNT("{c}") AS BIGINT)')
        if dt in ("tinyint", "smallint", "int", "bigint"):
            add(f"{c}#sum", f"SUM(CAST(`{c}` AS DECIMAL(38,0)))",
                f'SUM(CAST("{c}" AS HUGEINT))')
            add(f"{c}#min", f"MIN(`{c}`)", f'CAST(MIN("{c}") AS BIGINT)')
            add(f"{c}#max", f"MAX(`{c}`)", f'CAST(MAX("{c}") AS BIGINT)')
        elif dt in ("double", "float"):
            add(f"{c}#fsum", f"SUM(CAST(`{c}` AS DOUBLE))",
                f'SUM(CAST("{c}" AS DOUBLE))')
            add(f"{c}#fmin", f"MIN(`{c}`)", f'MIN("{c}")')
            add(f"{c}#fmax", f"MAX(`{c}`)", f'MAX("{c}")')
        elif dt == "string":
            add(f"{c}#lsum", f"SUM(CAST(LENGTH(`{c}`) AS DECIMAL(38,0)))",
                f'SUM(CAST(LENGTH("{c}") AS HUGEINT))')
            add(f"{c}#min", f"MIN(`{c}`)", f'MIN("{c}")')
            add(f"{c}#max", f"MAX(`{c}`)", f'MAX("{c}")')
        elif dt.startswith("timestamp"):
            add(f"{c}#usum",
                f"SUM(CAST(unix_micros(`{c}`) AS DECIMAL(38,0)))",
                f'SUM(CAST(epoch_us("{c}") AS HUGEINT))')
            add(f"{c}#min", f"CAST(unix_micros(MIN(`{c}`)) AS BIGINT)",
                f'CAST(epoch_us(MIN("{c}")) AS BIGINT)')
            add(f"{c}#max", f"CAST(unix_micros(MAX(`{c}`)) AS BIGINT)",
                f'CAST(epoch_us(MAX("{c}")) AS BIGINT)')
        elif dt == "boolean":
            add(f"{c}#tsum", f"SUM(CAST(`{c}` AS INT))",
                f'CAST(SUM(CAST("{c}" AS INT)) AS HUGEINT)')
        elif dt == "date":
            add(f"{c}#min", f"MIN(`{c}`)", f'MIN("{c}")')
            add(f"{c}#max", f"MAX(`{c}`)", f'MAX("{c}")')
        elif dt.startswith("decimal"):
            # exact decimal aggregates (ADVICE r9 low: decimals previously
            # fell through to null-count-only, so a decimal value
            # divergence above the cap passed silently). A common
            # DECIMAL(38,6) cast on both sides makes the sums exact and
            # scale-aligned regardless of each engine's declared scale.
            add(f"{c}#dsum", f"SUM(CAST(`{c}` AS DECIMAL(38,6)))",
                f'SUM(CAST("{c}" AS DECIMAL(38,6)))')
            add(f"{c}#dmin", f"MIN(CAST(`{c}` AS DECIMAL(38,6)))",
                f'MIN(CAST("{c}" AS DECIMAL(38,6)))')
            add(f"{c}#dmax", f"MAX(CAST(`{c}` AS DECIMAL(38,6)))",
                f'MAX(CAST("{c}" AS DECIMAL(38,6)))')
        # array/map/struct/binary: null-count only (added above)
    return spark_e, duck_e, labels


def _fp_equal(lbl: str, a, b) -> bool:
    if a is None or b is None:
        return a is None and b is None
    if "#f" in lbl:  # double aggregates: tolerance-banded
        fa, fb = float(a), float(b)
        if math.isnan(fa) or math.isnan(fb):
            return math.isnan(fa) and math.isnan(fb)
        return abs(fa - fb) <= _DOUBLE_REL_TOL * max(1.0, abs(fa), abs(fb))
    if isinstance(a, Decimal) or isinstance(b, Decimal):
        # numeric Decimal equality (Decimal('5') == Decimal('5.000000')):
        # exact for the integer-sum labels as before, AND correct for the
        # scaled #d* decimal aggregates, where the old int() truncation
        # would have equated 1.5 with 1.4
        return Decimal(a) == Decimal(b)
    return a == b


def compare_capped(
    spark_df, sf_dir: str, oracle: str, cap: int = COMPARE_CAP_ROWS
) -> tuple[bool, str]:
    """Driver-exact ``compare`` when the oracle result fits under ``cap``
    rows; distributed aggregate-fingerprint compare above it. Returns
    (ok, msg); msg starts with "agg-fingerprint" in the capped mode.

    The oracle executes ONCE (ADVICE r9 low: the old COUNT(*) probe ran
    the full oracle before either compare path, doubling oracle-side cost
    — ~770 s extra per execution for the 10× pagerank oracle): the result
    is materialized into a session temp table and the count, the full
    compare, and the fingerprint all read the materialization."""
    con = duckdb.connect()
    try:
        for t in TABLE_NAMES:
            con.execute(
                f"CREATE VIEW {t} AS SELECT * FROM "
                f"read_parquet('{sf_dir}/{t}.parquet')"
            )
        con.execute(f"CREATE TEMP TABLE _cc_result AS {oracle}")
        n = con.execute("SELECT COUNT(*) FROM _cc_result").fetchone()[0]
        if n <= cap:
            return compare(
                spark_df, sf_dir, "SELECT * FROM _cc_result", con=con
            )

        s_cols = spark_df.columns
        s_dtypes = dict(spark_df.dtypes)
        spark_e, duck_e, labels = _fingerprint_exprs(s_cols, s_dtypes)
        s_row = spark_df.selectExpr(*spark_e).collect()[0]
        try:
            d_tbl = con.execute(
                f"SELECT {', '.join(duck_e)} FROM _cc_result t"
            ).fetch_arrow_table()
        except duckdb.Error as exc:
            # Overflow asymmetry (ADVICE r10 low): Spark's non-ANSI
            # SUM(DECIMAL(38,6)) overflows to NULL while DuckDB RAISES —
            # report that divergence as a mismatch verdict instead of
            # aborting the sweep record with an unhandled exception.
            return False, (
                "agg-fingerprint divergence: duckdb raised while spark "
                f"returned a row ({type(exc).__name__}: {exc})"[:400]
            )
    finally:
        # A leaked connection retains its buffer pool; across a 177-entry
        # sweep that compounds into host-wide DuckDB OOM (observed r9).
        con.close()
    d_row = {f.name: d_tbl.column(i).to_pylist()[0]
             for i, f in enumerate(d_tbl.schema)}
    # column-set equality is structural: the duck aggregates are built from
    # the SPARK column list, so a column missing from the oracle errors out
    # in the duck execution above rather than passing silently.
    bad = [
        (lbl, s_row[lbl], d_row[lbl])
        for lbl in labels
        if not _fp_equal(lbl, s_row[lbl], d_row[lbl])
    ]
    if bad:
        return False, f"agg-fingerprint mismatch ({n} rows): {bad[:5]}"
    return True, f"agg-fingerprint ok ({n} rows, cap={cap})"
